"""Config system tests: YAML load, deep merge, dotlist overrides."""

import os

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
