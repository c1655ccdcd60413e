"""Minimal repro for the tattn+fused_mlp grad-program compile failure.

Round 2 observed the remote TPU compile helper rejecting the full training
step with the Pallas temporal-attention kernel AND the fused GEGLU MLP kernel
both enabled inside one grad program (HTTP 500, no diagnostics); each kernel
alone compiled, and every inference program compiled. The trainer has been
blanket-disabling tattn for ALL training since (engine/trainer.py).

This script pins the failure down to the smallest grad jit that triggers it:
a two-layer toy (temporal attention -> GEGLU MLP) with the four flag
combinations, compiled and run on the live backend. Output is one JSON line
per combination: {"tattn": b, "mlp": b, "ok": b, "err": "..."}.

RESOLVED (round 4, 2026-08-19): on the current toolchain all four toy
combinations compile AND the full flagship train step compiles with
GCD_TATTN_PALLAS=1 — the crash no longer reproduces. The trainer gate is
now kept on measured-performance grounds instead: tattn ON = 396.0 ms/step
vs 383.3 ms/step gated (bench.py GCD_BENCH_TRAIN, TPU v5e). Keep this
harness for future toolchain regressions.

Run on TPU:  python scripts/repro_tattn_mlp_grad.py
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from gcd_tpu.ops.dispatch import kernel_flags
    from gcd_tpu.ops.temporal_attention import temporal_attention
    from gcd_tpu.ops.fused_mlp import geglu_mlp

    t, s, c = 14, 384, 320
    bt = 2 * t
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (bt, s, c), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (c, 8 * c), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((8 * c,), jnp.bfloat16)
    w2 = jax.random.normal(ks[2], (4 * c, c), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((c,), jnp.bfloat16)

    def loss_fn(params, x):
        w1, b1, w2, b2 = params
        h = temporal_attention(x, x, x, timesteps=t, heads=5)
        h = h.reshape(-1, c)
        y = geglu_mlp(h, w1, b1, w2, b2)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    results = []
    for tattn in (True, False):
        for mlp in (True, False):
            row = {"tattn": tattn, "mlp": mlp}
            try:
                with kernel_flags(tattn_pallas=tattn, fused_mlp=mlp):
                    g = jax.jit(jax.grad(loss_fn))(
                        (w1, b1, w2, b2), x)
                    jax.block_until_ready(g)
                row["ok"] = True
            except Exception as e:  # noqa: BLE001 - we want the verbatim error
                row["ok"] = False
                row["err"] = f"{type(e).__name__}: {e}"[:500]
                traceback.print_exc(limit=3)
            print(json.dumps(row), flush=True)
            results.append(row)
            jax.clear_caches()
    return results


if __name__ == "__main__":
    main()
