"""Multi-process (multi-host) SPMD training proof.

The reference trains multi-node via Lightning DDP `--num_nodes`
(gcd-model/main.py:917-918); the TPU-native equivalent is a jax.distributed
cluster spanning one global mesh (gcd_tpu/parallel/distributed.py). This test
launches a REAL 2-process cluster (2 python subprocesses x 2 virtual CPU
devices each, forming one 4-device ("data","fsdp") mesh) through the main.py
CLI exactly as a user would on two hosts, and asserts:

  * the per-step losses match the single-process 4-device run to float32
    rounding (same global batches via loader process_shard, same global SPMD
    math; cross-process collectives reduce in a different order than the
    intra-process ones, so the last 1-2 ulp differ — measured 6e-8 relative);
  * logging/config snapshots are process-0-only (exactly one writer);
  * the multi-host orbax checkpoint restores: a second 2-process run resumes
    from it and continues to the requested step.
"""

import csv
import glob
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Global batch must divide the 4-device mesh for batch-axis sharding. Image
# logging is ON (batch_frequency=2 -> one log at step 2): the multi-process
# path gathers params to host on every process and samples on process 0 only
# (main.py; reference rank-0 ImageLogger, gcd-model/main.py:323-555); the
# single-process reference run logs identically, so the step math compared
# below is the same.
OVERLAY = """\
data:
  params:
    batch_size: 4
lightning:
  callbacks:
    image_logger:
      params:
        disabled: false
        batch_frequency: 2
        max_images: 1
        log_first_step: false
"""


def _ensure_fake_root():
    sys.path.insert(0, REPO)
    from scripts.make_fake_data import make_kubric_root

    root = "/tmp/kubric_fake"
    if not os.path.isdir(os.path.join(root, "pcl", "scn00000")):
        make_kubric_root(root)


def _env():
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _losses(logdir):
    with open(os.path.join(logdir, "metrics.csv")) as f:
        return [(int(r["step"]), float(r["loss"])) for r in csv.DictReader(f)]


def _run_single(args):
    r = subprocess.run(
        [sys.executable, "main.py", *args], cwd=REPO, env=_env(),
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    return r.stdout


def _run_cluster(args, num_processes=2):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "main.py", *args,
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", str(num_processes), "--process_id", str(p)],
            cwd=REPO, env=_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for p in range(num_processes)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    return outs


def test_two_process_cluster_matches_single_process(tmp_path):
    _ensure_fake_root()
    overlay = tmp_path / "overlay.yaml"
    overlay.write_text(OVERLAY)
    base = ["-b", "configs/smoke_kubric_tiny.yaml", str(overlay),
            "--seed", "7", "--no_date", "-n", "run", "--mesh_fsdp", "2"]

    # --- reference: single process over the SAME 4-device mesh ------------
    sp_root = str(tmp_path / "sp")
    out_sp = _run_single([*base, "--max_steps", "3", "--logdir", sp_root,
                          "--cpu_devices", "4"])
    assert "Training finished at step 3" in out_sp
    sp = _losses(os.path.join(sp_root, "run"))
    assert len(sp) == 3

    # --- 2 processes x 2 local virtual devices = one 4-device mesh --------
    mp_root = str(tmp_path / "mp")
    outs = _run_cluster([*base, "--max_steps", "3", "--logdir", mp_root,
                         "--cpu_devices", "2"])
    assert "Training finished at step 3" in outs[0]
    assert "2 process(es)" in outs[0]

    logdir = os.path.join(mp_root, "run")
    mp = _losses(logdir)

    # Same global batches + same global SPMD math. The cross-process
    # collective kernels reduce in a different order than the single-process
    # ones, so allow float32 rounding (a wrong batch slice or RNG would be
    # off by >1e-2, not 1e-6).
    assert [s for s, _ in mp] == [s for s, _ in sp]
    for (_, lm), (_, ls) in zip(mp, sp):
        assert abs(lm - ls) <= 1e-6 * max(1.0, abs(ls)), (mp, sp)

    # Process-0-only writers: one metrics.csv, one config snapshot.
    assert len(glob.glob(os.path.join(logdir, "configs", "*.yaml"))) == 1
    assert os.path.exists(os.path.join(logdir, "metrics.csv"))

    # Image logging under multi-process: process 0 gathered the params and
    # wrote media; process 1 wrote nothing (both processes share one
    # filesystem here, so writer identity is asserted via the marker line).
    assert "image log written at step 2 (process 0)" in outs[0]
    assert "image log written" not in outs[1]
    media = glob.glob(os.path.join(logdir, "images", "train", "*_sample.mp4"))
    assert media, "process 0 did not write the sampled mp4"
    assert glob.glob(os.path.join(logdir, "images", "train", "*_strip.png"))

    # Multi-host orbax checkpoint landed (final save at step 3).
    assert glob.glob(os.path.join(logdir, "checkpoints", "step_3"))

    # --- resume the cluster from the multi-host checkpoint ----------------
    outs2 = _run_cluster([
        "-r", logdir, "--max_steps", "5", "--mesh_fsdp", "2",
        "--cpu_devices", "2",
    ])
    assert "Training finished at step 5" in outs2[0]
    rows = _losses(logdir)
    assert rows[-1][0] == 5
