"""Config system tests: YAML load, deep merge, dotlist overrides."""

import os

import pytest

from gcd_tpu.utils.config import (
    merge_configs,
    from_dotlist,
    apply_dotlist,
    load_config,
    get_by_path,
    set_by_path,
)

REF_CONFIG = "/root/reference/gcd-model/configs/train_kubric_max90.yaml"


def test_deep_merge():
    a = {"m": {"x": 1, "y": 2}, "k": 3}
    b = {"m": {"y": 5, "z": 6}}
    out = merge_configs([a, b])
    assert out == {"m": {"x": 1, "y": 5, "z": 6}, "k": 3}


def test_dotlist_parsing():
    out = from_dotlist(["a.b.c=1", "x=[2, 3]", "name=hello", "f=1e-4", "flag=True"])
    assert out["a"]["b"]["c"] == 1
    assert out["x"] == [2, 3]
    assert out["name"] == "hello"
    assert abs(out["f"] - 1e-4) < 1e-12
    assert out["flag"] is True


def test_apply_dotlist_override():
    cfg = {"model": {"params": {"lr": 0.001}}}
    out = apply_dotlist(cfg, ["model.params.lr=0.01"])
    assert out["model"]["params"]["lr"] == 0.01


def test_load_reference_config():
    if not os.path.exists(REF_CONFIG):
        return
    cfg = load_config(REF_CONFIG)
    assert cfg["model"]["target"] == "sgm.models.diffusion.DiffusionEngine"
    assert get_by_path(cfg, "model.params.network_config.params.model_channels") == 320
    assert get_by_path(cfg, "data.params.frame_width") == 384


def test_set_get_by_path():
    cfg = {}
    set_by_path(cfg, "a.b.c", 7)
    assert get_by_path(cfg, "a.b.c") == 7
    assert get_by_path(cfg, "a.b.missing", "dflt") == "dflt"


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CFG_DIR = "/root/reference/gcd-model/configs"


def _subset_diff(ref, ours, path=""):
    """Paths present in ref but missing/different in ours. Lists compare
    exactly (config lists like emb_models replace wholesale on merge)."""
    diffs = []
    if isinstance(ref, dict) and isinstance(ours, dict):
        for k, v in ref.items():
            if k not in ours:
                diffs.append(f"{path}.{k}: missing")
            else:
                diffs.extend(_subset_diff(v, ours[k], f"{path}.{k}"))
    elif isinstance(ref, list) and isinstance(ours, list):
        if len(ref) != len(ours):
            diffs.append(f"{path}: list length {len(ref)} != {len(ours)}")
        else:
            for i, (a, b) in enumerate(zip(ref, ours)):
                diffs.extend(_subset_diff(a, b, f"{path}[{i}]"))
    elif ref != ours:
        diffs.append(f"{path}: {ref!r} != {ours!r}")
    return diffs


@pytest.mark.parametrize("name", [
    "train_kubric_max90", "train_kubric_max180",
    "train_pardom_rgb", "train_pardom_semantic",
    "infer_kubric", "infer_pardom",
])
def test_shipped_configs_match_reference(name):
    """The shipped include-based config family must be semantically equivalent
    to the reference's monolithic yamls: every reference key appears with the
    identical value (our configs may carry extra keys, e.g. the infer configs
    retain the loss block, which inference ignores)."""
    ref_fp = os.path.join(REF_CFG_DIR, f"{name}.yaml")
    if not os.path.exists(ref_fp):
        pytest.skip("reference mirror not mounted")
    ref = load_config(ref_fp)
    ours = load_config(os.path.join(REPO_ROOT, "configs", f"{name}.yaml"))
    diffs = _subset_diff(ref, ours)
    assert diffs == [], "\n".join(diffs)


def test_pretrained_configs_layer_move_time():
    """pretrained/* reconstructions: gradual/direct differ only by move_time
    (reference pretrained yamls, SURVEY.md section 2.7)."""
    g = load_config(os.path.join(REPO_ROOT, "pretrained", "kubric_gradual_max90.yaml"))
    d = load_config(os.path.join(REPO_ROOT, "pretrained", "kubric_direct_max90.yaml"))
    assert get_by_path(g, "data.params.move_time") == 13
    assert get_by_path(d, "data.params.move_time") == 0
    g["data"]["params"]["move_time"] = 0
    g["model"]["params"]["ckpt_path"] = d["model"]["params"]["ckpt_path"]
    assert g == d
