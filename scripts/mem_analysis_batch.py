"""HBM memory analysis of the batched-serving program vs batch size.

Diagnoses the PERF_BATCH batch-4 cliff (VERDICT r3 "Next round" #3): lowers
and compiles the bench sampler program at each batch size and prints XLA's
memory_analysis — if the batch-4 program's temp+argument footprint crosses
the chip's HBM (16 GB on v5e), the 5x throughput collapse is memory
oversubscription (XLA serializing/rematerializing to fit), not a wedge.

Compilations are cache-warm after a PERF_BATCH sweep on the same toolchain.

Usage (TPU):  timeout 3600 python scripts/mem_analysis_batch.py [--batches 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(batch: int) -> dict:
    import jax

    from bench import build_sampler_fn

    run_clip = build_sampler_fn(batch)
    # functools.partial(run_clip, uparams, dparams) -> trace the underlying
    # jitted fn with the bound args so AOT lower/compile sees real shapes.
    # Honor the program-level kernel policy (kernel_overrides) so the
    # analyzed program matches what the bench actually runs.
    from contextlib import nullcontext

    from gcd_tpu.ops.dispatch import kernel_flags

    overrides = getattr(run_clip, "kernel_overrides", None)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    with kernel_flags(**overrides) if overrides else nullcontext():
        lowered = run_clip.func.lower(*run_clip.args, key)
    compiled = lowered.compile()
    dt = time.time() - t0
    row = {"clips_per_batch": batch, "compile_s": round(dt, 1)}
    try:
        ma = compiled.memory_analysis()
        for name in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "alias_size_in_bytes",
                     "generated_code_size_in_bytes",
                     "peak_memory_in_bytes"):
            v = getattr(ma, name, None)
            if v is not None:
                row[name.replace("_in_bytes", "_gib")] = round(v / 2**30, 3)
    except Exception as e:  # memory_analysis availability varies by backend
        row["memory_analysis_error"] = repr(e)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    args = ap.parse_args()
    for b in [int(x) for x in args.batches.split(",")]:
        print(json.dumps(analyze(b)), flush=True)


if __name__ == "__main__":
    main()
