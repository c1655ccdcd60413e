"""Full-size SPMD compile validation (VERDICT r2 "Next round" #3).

Everything else exercises the sharding rules on the tiny test engine; this
compiles the PRODUCTION-size train step + serving sampler over the 8-device
virtual mesh (child process: tests/spmd_fullsize_child.py) and asserts the
SPMD partitioner stays silent."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_fullsize_train_and_serving_compile_on_8dev_mesh():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tests", "spmd_fullsize_child.py")],
        capture_output=True, text=True, timeout=3000, cwd=ROOT,
    )
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert "SPMD_FULLSIZE_OK" in r.stdout
    assert "sharding audit OK" in r.stdout
    bad = [l for l in r.stderr.splitlines()
           if "Involuntary full rematerialization" in l]
    assert not bad, f"{len(bad)} involuntary-remat warnings, e.g. {bad[:3]}"
