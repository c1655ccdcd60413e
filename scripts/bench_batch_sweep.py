"""Serving-throughput sweep: frames/sec/chip vs clips-per-batch.

Runs the wedge-resilient bench supervisor (`bench.py`) once per batch size
with GCD_BENCH_BATCH set, collects the JSON lines, and writes PERF_BATCH.json
at the repo root (VERDICT r2 "Next round" #5: a recorded artifact for the
batched-serving configuration, distinct from the driver's batch-1 latency
line).

Usage (real TPU):
    timeout 5400 python scripts/bench_batch_sweep.py [--batches 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(batch: int, budget_s: int, extra_env: dict | None = None) -> dict:
    env = dict(os.environ)
    env["GCD_BENCH_BATCH"] = str(batch)
    env["GCD_BENCH_BUDGET_S"] = str(budget_s)
    env.update(extra_env or {})
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env,
        timeout=budget_s + 300,
    )
    if r.stderr:
        print(r.stderr[-2000:], file=sys.stderr)
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            d = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if not (isinstance(d, dict) and "value" in d):
            continue
        # Provenance gate (ADVICE r3 #1): the supervisor's stale-fallback
        # line re-emits the LAST GOOD batch-1 record on budget exhaustion;
        # accepting it here fabricated a batch-N measurement (the round-3
        # batch=4 "1.06 f/s" row). Only a fresh, error-free result whose
        # batch matches the requested one counts.
        measured_batch = int(d.get("clips_per_batch", 1))
        if d.get("stale") or d.get("error") or measured_batch != batch:
            return {"clips_per_batch": batch, "value": 0.0,
                    "error": ("stale-fallback result rejected" if d.get("stale")
                              else d.get("error")
                              or f"result was for batch {measured_batch}, "
                                 f"requested {batch}"),
                    "rejected_result": d,
                    "wall_s": round(time.time() - t0, 1)}
        d["wall_s"] = round(time.time() - t0, 1)
        return d
    return {"clips_per_batch": batch, "value": 0.0,
            "error": f"no parseable result (rc={r.returncode})",
            "stderr_tail": (r.stderr or "")[-500:]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--budget_s", type=int, default=1500,
                    help="bench supervisor budget per batch size")
    ap.add_argument("--out", default=os.path.join(ROOT, "PERF_BATCH.json"))
    args = ap.parse_args()

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        print(f"[sweep] batch {b} ...", file=sys.stderr, flush=True)
        d = run_one(b, args.budget_s)
        d.setdefault("clips_per_batch", b)
        rows.append(d)
        print(json.dumps(d), flush=True)

    out = {
        "workload": "14f 384x256 25-step EulerEDM CFG sampling + VAE decode",
        "metric": "frames/sec/chip vs clips batched per program",
        "chip": next((r.get("chip") for r in rows if r.get("chip")), None),
        "rows": [
            {k: r.get(k) for k in ("clips_per_batch", "value",
                                   "p50_clip_latency_s", "error",
                                   "stale", "note", "wall_s",
                                   "kernels_check_ok")
             if r.get(k) is not None}
            for r in rows
        ],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
