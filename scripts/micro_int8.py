"""Microbenchmark: is int8 MXU throughput real on this chip/toolchain?

Sizes a potential int8 quantized serving path (opt-in) for the fused GEGLU
MLP / attention projections: times bf16 vs int8 (s32-accumulate) matmuls at
the UNet ds1 transformer shapes. v5e's spec sheet lists 394 TOPS int8 vs
197 TFLOP/s bf16; if XLA actually hits ~2x here, an int8 W8A8 kernel for the
MLP is worth building. If not, the attack is dead for this toolchain and
this file is its measured tombstone.

Usage (TPU):  timeout 600 python scripts/micro_int8.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def time_fn(fn, *args, iters: int = 20) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    # ds1 spatial-transformer MLP shapes: (B*T, S, C) @ (C, 4C*2) GEGLU in,
    # (B*T, S, 4C) @ (4C, C) out. B*T=28 (14f CFG-doubled), S=1536, C=320.
    shapes = [
        ("mlp_in  (43008,320)@(320,2560)", (28 * 1536, 320), (320, 2560)),
        ("mlp_out (43008,1280)@(1280,320)", (28 * 1536, 1280), (1280, 320)),
        ("attn_qkv (43008,320)@(320,960)", (28 * 1536, 320), (320, 960)),
        ("big      (8192,2048)@(2048,8192)", (8192, 2048), (2048, 8192)),
    ]
    key = jax.random.PRNGKey(0)
    rows = []
    for name, a_shape, b_shape in shapes:
        ka, kb = jax.random.split(key)
        a16 = jax.random.normal(ka, a_shape, jnp.bfloat16)
        b16 = jax.random.normal(kb, b_shape, jnp.bfloat16)
        a8 = (a16.astype(jnp.float32) * 16).astype(jnp.int8)
        b8 = (b16.astype(jnp.float32) * 16).astype(jnp.int8)

        f16 = jax.jit(lambda x, y: x @ y)
        f8 = jax.jit(lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        # int8 with bf16 dequant epilogue (what a real kernel pays)
        f8d = jax.jit(lambda x, y: (jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
            * (1.0 / 256.0)).astype(jnp.bfloat16))

        t16 = time_fn(f16, a16, b16)
        t8 = time_fn(f8, a8, b8)
        t8d = time_fn(f8d, a8, b8)
        flops = 2 * a_shape[0] * a_shape[1] * b_shape[1]
        row = {
            "shape": name,
            "bf16_us": round(t16 * 1e6, 1),
            "bf16_tflops": round(flops / t16 / 1e12, 1),
            "int8_us": round(t8 * 1e6, 1),
            "int8_tops": round(flops / t8 / 1e12, 1),
            "int8_dequant_us": round(t8d * 1e6, 1),
            "speedup_vs_bf16": round(t16 / t8d, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"devices": str(jax.devices())}))


if __name__ == "__main__":
    main()
