"""Real-weights runbook dry-run (VERDICT r3 next-round #10).

No released GCD checkpoint is mounted in this environment, so this test
manufactures one at the REAL key space / tensor layouts / dtype
(scripts/make_synth_ckpt.py — full-size SVD UNet + VAE + CLIP ViT-H towers,
f16, LitEma shadows) and drives the exact command sequence a user runs the
day a real `kubric_gradual_max90.ckpt` is available:

    make_synth_ckpt.py -> convert_ckpt.py (strict report: 0 missing keys)
    -> scripts/test.py --model_path <orbax dir> on one control.

Everything is full model width; only the spatial/temporal extents and the
dataset are shrunk so one CPU core finishes. README.md "Real released
weights" documents the same sequence.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(os.environ.get("GCD_SKIP_FULLSIZE") == "1",
                       reason="GCD_SKIP_FULLSIZE=1"),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Full-size model (via the pretrained include) + the fake-root tiny dataset.
CONFIG_TPL = """\
include:
  - {repo}/pretrained/kubric_gradual_max90.yaml

data:
  target: sgm.data.kubric_arbit.KubricSynthViewModule
  params:
    dset_root: /tmp/kubric_fake/data
    pcl_root: /tmp/kubric_fake/pcl
    train_videos: 1
    val_videos: 0
    test_videos: 0
    avail_frames: 16
    model_frames: 3
    input_frames: 3
    output_frames: 3
    center_crop: true
    frame_width: 64
    frame_height: 64
    move_time: 2
    modal_time: 0
    mock_dset_size: 8
    data_gpu: 0
    spread_radius: 1
    render_width: 72
    render_height: 72
    batch_size: 1
    num_workers: 0
"""


def _ensure_fake_root():
    import sys

    sys.path.insert(0, REPO)
    from scripts.make_fake_data import make_kubric_root

    root = "/tmp/kubric_fake"
    if not os.path.isdir(os.path.join(root, "pcl", "scn00000")):
        make_kubric_root(root)


def test_realweights_runbook(tmp_path, capsys):
    _ensure_fake_root()
    cfg_path = tmp_path / "runbook.yaml"
    cfg_path.write_text(CONFIG_TPL.format(repo=REPO))

    import scripts.make_synth_ckpt as make_synth
    import scripts.convert_ckpt as convert
    import scripts.test as test_mod

    ckpt = str(tmp_path / "synth_gcd.ckpt")
    # 64x64 is the smallest geometry the full-size UNet accepts: frames must
    # be a multiple of 64 (VAE 8x + 3 UNet downsamples; the reference asserts
    # the same in gcd-model/scripts/test.py:309-310). engine.init_params now
    # rejects illegal geometries early.
    make_synth.main([
        "--config_path", str(cfg_path), "--output", ckpt,
        "--dtype", "float16",
        "--frame_height", "64", "--frame_width", "64", "--num_frames", "3",
    ])
    assert os.path.getsize(ckpt) > 4e9, (
        "synthetic checkpoint is not at real byte-scale: "
        f"{os.path.getsize(ckpt) / 1e9:.2f} GB")

    # Key-space agreement with the INDEPENDENT reference manifest
    # (scripts/make_ref_key_manifest.py: state_dict().keys() + shapes dumped
    # from the reference's own torch modules on the meta device) — closes
    # the self-referential loop where the synth ckpt only proved the
    # converter's round-trip consistency (VERDICT r4 next-round #9).
    with open(os.path.join(REPO, "tests", "_golden",
                           "ref_key_manifest.json")) as f:
        manifest = json.load(f)["keys"]
    sd = torch.load(ckpt, map_location="cpu", mmap=True,
                    weights_only=True)["state_dict"]
    missing = [k for k in manifest if k not in sd]
    assert not missing, f"{len(missing)} manifest keys absent: {missing[:10]}"
    bad_shapes = [
        (k, tuple(sd[k].shape), tuple(manifest[k]))
        for k in manifest if tuple(sd[k].shape) != tuple(manifest[k])
    ]
    assert not bad_shapes, bad_shapes[:10]
    # Synth-only keys must be the open_clip family the reference cannot
    # instantiate in this image (manifest "excluded" section).
    synth_only = {k for k in sd if k not in manifest
                  and not k.startswith("conditioner.embedders.0.")}
    assert not synth_only, sorted(synth_only)[:20]

    orbax_dir = str(tmp_path / "synth_gcd_jax")
    convert.main([
        "--config_path", str(cfg_path), "--model_path", ckpt,
        "--output", orbax_dir,
        "--frame_height", "64", "--frame_width", "64", "--num_frames", "3",
    ])
    out = capsys.readouterr().out
    # Strict report: every template leaf found in the checkpoint.
    assert "with 0 missing" in out, out[-3000:]
    assert os.path.isdir(os.path.join(orbax_dir, "step_0"))

    out_dir = str(tmp_path / "eval")
    test_mod.main([
        "--config_path", str(cfg_path),
        "--model_path", orbax_dir,
        "--input", "0",
        "--generate_controls",
        "--samples_per_scene", "1",
        "--num_samples", "1",
        "--num_steps", "2",
        "--num_frames", "3",
        "--frame_width", "64",
        "--frame_height", "64",
        "--decoding_t", "3",
        "--galleries", "rich1",
        "--output", out_dir,
    ])
    mdir = os.path.join(out_dir, "synth_gcd_jax")
    with open(os.path.join(mdir, "summary_metrics.json")) as f:
        summary = json.load(f)
    s = summary["summary"] if "summary" in summary else summary
    assert np.isfinite(s["psnr"]), s
    assert any(f.endswith("_gal.mp4") for f in os.listdir(mdir))
