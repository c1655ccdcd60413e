"""main.py end-to-end training smoke on the fake Kubric root: config merge,
data loading + host render, jitted FSDP train steps, CSV metrics, checkpoint
write, and resume continuing from the saved step (subprocess-driven, as a
user would run it)."""

import csv
import glob
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_fake_root():
    sys.path.insert(0, REPO)
    from scripts.make_fake_data import make_kubric_root

    root = "/tmp/kubric_fake"
    if not os.path.isdir(os.path.join(root, "pcl", "scn00000")):
        make_kubric_root(root)


def _run_main(args):
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "main.py", *args], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    return r.stdout


def test_train_checkpoint_resume(tmp_path):
    _ensure_fake_root()
    logroot = str(tmp_path / "logs")

    out = _run_main([
        "-b", "configs/smoke_kubric_tiny.yaml", "--max_steps", "5",
        "--logdir", logroot, "--no_date", "-n", "smoke",
        "--cpu_devices", "2", "--mesh_fsdp", "2", "--seed", "7",
    ])
    assert "Training finished at step 5" in out

    logdir = os.path.join(logroot, "smoke")
    # metrics CSV has one row per step with loss/grad_norm/lr
    with open(os.path.join(logdir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5
    assert {"step", "loss", "grad_norm", "lr"} <= set(rows[0])
    assert all(float(r["loss"]) > 0 for r in rows)

    # checkpoint written at step 5 (every_n_train_steps: 5 + final save)
    ckpts = glob.glob(os.path.join(logdir, "checkpoints", "*"))
    assert ckpts, os.listdir(logdir)

    # merged config snapshot saved for resume replay
    assert glob.glob(os.path.join(logdir, "configs", "*.yaml"))

    # image logger fired at batch_frequency=4
    media = glob.glob(os.path.join(logdir, "images", "train", "*"))
    assert media, "ImageLogger wrote nothing"

    # resume: continues from step 5 and reaches 7
    out2 = _run_main([
        "-r", logdir, "--max_steps", "7",
        "--cpu_devices", "2", "--mesh_fsdp", "2",
    ])
    assert "Training finished at step 7" in out2
    with open(os.path.join(logdir, "metrics.csv")) as f:
        rows2 = list(csv.DictReader(f))
    assert int(rows2[-1]["step"]) == 7
