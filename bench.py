"""Benchmark: frames/sec/chip for the reference's headline inference workload —
one 14-frame 384x256 clip, 25-step EulerEDM sampling with per-frame CFG
(batch doubled to 28) plus VideoDecoder VAE decode.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline compares against an estimated A100 throughput for the same
workload. The reference publishes no wall-clock numbers (SURVEY.md section 6);
the A100 estimate is derived from community SVD timings (~40 s for 25 frames
at 576x1024, 25 steps, CFG on A100) scaled by pixel count and frame count to
GCD's clip size: ~4.0 s/clip => ~3.5 frames/s. BASELINE.json's north star is
>=5x this per chip.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

A100_EST_FRAMES_PER_SEC = 3.5  # see module docstring

T = 14
H, W = 256, 384
HL, WL = H // 8, W // 8
STEPS = 25


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_sampler_fn():
    from __graft_entry__ import _flagship_unet
    from gcd_tpu.diffusion import Denoiser, EulerEDMSampler
    from gcd_tpu.models.vae import VideoDecoder

    model = _flagship_unet(dtype=jnp.bfloat16)
    denoiser = Denoiser(
        {"target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"}
    )
    sampler = EulerEDMSampler(
        num_steps=STEPS,
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_max": 700.0},
        },
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
            "params": {"num_frames": T, "max_scale": 1.5, "min_scale": 1.0},
        },
    )

    bt = 2 * T
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((bt, HL, WL, 8), jnp.bfloat16),
            jnp.zeros((bt,)),
            jnp.zeros((bt, 1, 1024)),
            jnp.zeros((bt, 768 + 128)),
            num_video_frames=T,
            image_only_indicator=jnp.zeros((2, T)),
        )
    )
    # Random bf16 weights (production serving precision): zeros weights were
    # observed to perturb timing on this runtime; random matches converted
    # checkpoints' compute exactly.
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    uparams = jax.tree_util.tree_unflatten(treedef, [
        jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02
        for k, l in zip(keys, leaves)
    ])

    decoder = VideoDecoder(
        ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
        z_channels=4, double_z=True, in_channels=3, out_ch=3, resolution=256,
        video_kernel_size=[3, 1, 1], dtype=jnp.bfloat16,
    )
    dshapes = jax.eval_shape(
        lambda: decoder.init(jax.random.PRNGKey(0),
                             jnp.zeros((T, HL, WL, 4), jnp.bfloat16), timesteps=T)
    )
    dleaves, dtreedef = jax.tree_util.tree_flatten(dshapes)
    dkeys = jax.random.split(jax.random.PRNGKey(2), len(dleaves))
    dparams = jax.tree_util.tree_unflatten(dtreedef, [
        jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02
        for k, l in zip(dkeys, dleaves)
    ])

    ioi2 = jnp.zeros((2, T))

    # Optional XLA compiler-option overrides, e.g.
    #   GCD_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=65536,..." python bench.py
    # (client-side XLA_FLAGS are rejected by the axon tunnel build; per-jit
    # compiler_options are forwarded to the remote compiler and do apply).
    import functools
    import os

    opts = None
    if os.environ.get("GCD_XLA_OPTS"):
        opts = dict(kv.split("=", 1)
                    for kv in os.environ["GCD_XLA_OPTS"].split(","))
        log(f"compiler_options: {opts}")

    @functools.partial(jax.jit, compiler_options=opts)
    def run_clip(uparams, dparams, key):
        def network(x, c_noise, cond, **extra):
            xin = jnp.concatenate(
                [x.astype(jnp.bfloat16), cond["concat"].astype(jnp.bfloat16)],
                axis=-1,
            )
            return model.apply(
                uparams, xin, c_noise, cond["crossattn"], cond["vector"],
                num_video_frames=T, image_only_indicator=ioi2,
            ).astype(jnp.float32)

        def denoise_fn(x, sigma, cond):
            return denoiser(network, x, sigma, cond)

        cond = {
            "crossattn": jnp.zeros((T, 1, 1024)),
            "vector": jnp.zeros((T, 768 + 128)),
            "concat": jnp.zeros((T, HL, WL, 4)),
        }
        uc = {
            "crossattn": jnp.zeros((T, 1, 1024)),
            "vector": jnp.zeros((T, 768 + 128)),
            "concat": jnp.zeros((T, HL, WL, 4)),
        }
        noise = jax.random.normal(key, (T, HL, WL, 4), dtype=jnp.float32)
        z = sampler(denoise_fn, noise, cond, uc, key=key)
        frames = decoder.apply(dparams, (z / 0.18215).astype(jnp.bfloat16),
                               timesteps=T)
        return frames.astype(jnp.float32)

    return functools.partial(run_clip, uparams, dparams)


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    run_clip = build_sampler_fn()
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    out = run_clip(key)
    out.block_until_ready()
    log(f"compile+first run: {time.time()-t0:.1f}s, out {out.shape}")

    times = []
    n_iter = 5
    for i in range(n_iter):
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        run_clip(k).block_until_ready()
        times.append(time.time() - t0)
    clip_time = min(times)
    p50 = sorted(times)[len(times) // 2]
    fps = T / clip_time
    log(f"clip times: {['%.2f' % t for t in times]} -> {fps:.2f} frames/s, "
        f"p50 clip latency {p50:.2f}s")

    print(json.dumps({
        "metric": "frames/sec/chip, 14f 384x256 25-step EulerEDM + VAE decode",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_EST_FRAMES_PER_SEC, 3),
        "p50_clip_latency_s": round(p50, 3),
    }))


if __name__ == "__main__":
    main()
