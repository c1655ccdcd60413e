"""GN-stats layout-policy sweep over every servable CFG-doubled extent.

The round-4 batch-4 diagnosis (PERF_BATCH.json) proved XLA's layout
assignment can give GroupNorm-stats fusions a catastrophic batch-minormost
layout at extent 112 and that tracing the whole program with the opaque
Pallas GN-stats kernel (gn_stats_pallas) fixes it. The shipped policy
(gcd_tpu/ops/dispatch.py program_flag_overrides) fired only on the single
measured extent — a point patch. This sweep measures EVERY extent a server
can compile (clips-per-batch 1/2/4/8 x T=14 x2 CFG => bt 28/56/112/224)
with the kernel forced OFF and forced ON through the wedge-resilient
provenance-gated bench harness, and writes the matrix + the derived policy
into PERF_BATCH.json v2 so program_flag_overrides is a measured table.

Usage (real TPU, ~1h):
    timeout 7200 python scripts/bench_policy_sweep.py [--batches 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from scripts.bench_batch_sweep import run_one  # noqa: E402

T = 14


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--budget_s", type=int, default=1500)
    ap.add_argument("--out", default=os.path.join(ROOT, "PERF_BATCH.json"))
    args = ap.parse_args()

    prior = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        for gn in ("0", "1"):
            tag = f"batch {b} gn_stats={gn}"
            print(f"[policy-sweep] {tag} ...", file=sys.stderr, flush=True)
            d = run_one(b, args.budget_s,
                        extra_env={"GCD_GN_STATS": gn, "GCD_BENCH_CHECK": "0"})
            d.setdefault("clips_per_batch", b)
            d["bt_extent"] = 2 * b * T
            d["gn_stats_pallas"] = gn == "1"
            rows.append(d)
            print(json.dumps({k: d.get(k) for k in (
                "clips_per_batch", "bt_extent", "gn_stats_pallas", "value",
                "p50_clip_latency_s", "error")}), flush=True)
            _write(args.out, prior, rows)  # persist after every cell

    _write(args.out, prior, rows)
    print(f"wrote {args.out}", file=sys.stderr)


def _derive_policy(rows) -> dict:
    """extent -> gn_stats_pallas choice, by measured frames/s."""
    by_extent = {}
    for r in rows:
        if r.get("error") or not r.get("value"):
            continue
        by_extent.setdefault(r["bt_extent"], {})[r["gn_stats_pallas"]] = \
            r["value"]
    policy = {}
    for ext, vals in sorted(by_extent.items()):
        if True in vals and False in vals:
            policy[str(ext)] = {
                "gn_stats_pallas": vals[True] > vals[False],
                "fps_on": vals[True], "fps_off": vals[False],
            }
    return policy


def _write(path, prior, rows):
    out = {
        "workload": "14f 384x256 25-step EulerEDM CFG sampling + VAE decode",
        "metric": "frames/sec/chip vs clips batched per program",
        "chip": next((r.get("chip") for r in rows if r.get("chip")),
                     prior.get("chip")),
        "note": ("v2: full gn_stats on/off matrix per extent; "
                 "dispatch.program_flag_overrides encodes the derived "
                 "policy, which serving (engine/server.py), AOT export "
                 "(engine/export.py), eval (eval_utils.make_sampler) and "
                 "bench all apply at trace time"),
        "rows": [
            {k: r.get(k) for k in ("clips_per_batch", "bt_extent",
                                   "gn_stats_pallas", "value",
                                   "p50_clip_latency_s", "error",
                                   "stale", "note", "wall_s")
             if r.get(k) is not None}
            for r in rows
        ],
        "derived_policy": _derive_policy(rows),
    }
    if "batch4_diagnosis" in prior:
        out["batch4_diagnosis"] = prior["batch4_diagnosis"]
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
