"""Speed-of-light (roofline) report for the headline bench workload.

Computes analytic FLOPs / bytes for the three legs of the benchmark clip
(one CFG-doubled denoiser step, the 25-step sampling loop, the VAE decode)
via jax's client-side HLO cost analysis, and compares against the chip's
peak compute / HBM bandwidth and the last measured wall-clock numbers
(.bench_last_good.json). This is the written ceiling argument asked for by
VERDICT round-1 #3 ("a measurement showing the ceiling and why").

Runs entirely on CPU (lowering only, no TPU needed):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/perf_report.py

Caveats:
  * cost analysis runs on UNOPTIMIZED HLO: flops are exact for matmul/conv
    math, but `bytes accessed` ignores fusion, so only flops are used for
    the compute roofline; the bandwidth bound is quoted from measured
    hlo_stats profiles instead (scripts/profile_bench.py).
  * Pallas kernels dispatch to their XLA fallbacks on the CPU lowering
    path — same mathematical op counts, which is what SOL needs.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Chip peaks. v5e: 197 TFLOP/s bf16, 819 GB/s HBM (public spec sheet).
# v5p: 459 TFLOP/s bf16, 2765 GB/s. The axon chip reports "TPU v5 lite".
PEAKS = {
    "v5e": {"tflops_bf16": 197.0, "hbm_gbps": 819.0},
    "v5p": {"tflops_bf16": 459.0, "hbm_gbps": 2765.0},
}


def leg_cost(lowered) -> dict:
    ca = lowered.cost_analysis()
    return {"gflops": ca.get("flops", 0.0) / 1e9,
            "gbytes": ca.get("bytes accessed", 0.0) / 1e9}


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__
    from bench import HL, STEPS, T, WL, make_decoder

    print("lowering denoiser step (CFG-doubled, full-size SVD UNet)...",
          file=sys.stderr)
    fn, args = __graft_entry__.entry()
    step = leg_cost(jax.jit(fn).lower(*args))

    print("lowering VAE decode...", file=sys.stderr)
    decoder, dparams = make_decoder()
    dec_fn = jax.jit(lambda z: decoder.apply(dparams, z, timesteps=T))
    z = jax.ShapeDtypeStruct((T, HL, WL, 4), jnp.bfloat16)
    dec = leg_cost(jax.jit(dec_fn).lower(z))

    clip_gflops = STEPS * step["gflops"] + dec["gflops"]

    peak = PEAKS["v5e"]
    sol_step_ms = step["gflops"] / peak["tflops_bf16"]
    sol_dec_ms = dec["gflops"] / peak["tflops_bf16"]
    sol_clip_s = (STEPS * sol_step_ms + sol_dec_ms) / 1e3

    print(f"\n=== analytic workload (14f 384x256, {STEPS}-step CFG EDM) ===")
    print(f"denoiser step : {step['gflops']:11.1f} GFLOP "
          f"(SOL {sol_step_ms:6.2f} ms @ {peak['tflops_bf16']:.0f} TF/s bf16)")
    print(f"VAE decode    : {dec['gflops']:11.1f} GFLOP "
          f"(SOL {sol_dec_ms:6.2f} ms)")
    print(f"full clip     : {clip_gflops:11.1f} GFLOP "
          f"(SOL {sol_clip_s:6.3f} s -> {T/sol_clip_s:.1f} frames/s SOL)")

    last = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_last_good.json")
    if os.path.exists(last):
        with open(last) as f:
            d = json.load(f)
        meas_s = T / d["value"]
        print(f"\n=== measured ({d.get('chip', '?')}) ===")
        print(f"clip: {meas_s:.3f} s ({d['value']} frames/s) -> "
              f"achieved {clip_gflops/meas_s/1e3:.1f} TF/s, "
              f"{100*sol_clip_s/meas_s:.0f}% of bf16-peak SOL")
        print("(profiled split: ~91% sampling / ~9% decode; top op family is "
              "conv fusions forced to co-emit GroupNorm statistics at "
              "13-40 GiB/s effective — see INVENTORY.md perf notes)")


if __name__ == "__main__":
    main()
