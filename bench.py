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

Resilience: the axon TPU tunnel wedges transiently (device errors / hangs that
self-recover in 1-5 min). The default entrypoint is therefore a SUPERVISOR that
runs the actual benchmark in a subprocess (`bench.py --inner`) under a timeout,
polls the tunnel with fresh-shape compile probes between attempts, and retries
serially within a total budget (GCD_BENCH_BUDGET_S, default 2700s). Round 1's
number was lost to exactly one such wedge (VERDICT.md "What's weak" #2).
"""

from __future__ import annotations

import json
import os
import subprocess
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


def make_decoder():
    """VideoDecoder at the production SVD config with random bf16 weights.

    Shared by the bench clip and scripts/profile_bench.py's decode-only
    profile (the decode leg is ~9% of the clip; see INVENTORY perf notes)."""
    from gcd_tpu.models.vae import VideoDecoder

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
    return decoder, dparams


def build_sampler_fn(batch: int = 1):
    """Jitted end-to-end clip fn: 25-step CFG-doubled sampling + VAE decode.

    `batch` > 1 packs several independent clips into one program ((B*T)
    leading axis, the reference's collate convention) — the serving-throughput
    configuration. The driver metric stays batch=1 (latency-bound, matching
    the reference's per-clip workload); see GCD_BENCH_BATCH below.
    """
    from __graft_entry__ import _flagship_unet
    from gcd_tpu.diffusion import Denoiser, EulerEDMSampler

    model = _flagship_unet(dtype=jnp.bfloat16)
    denoiser = Denoiser(
        {"target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"}
    )
    # GCD_GUIDANCE_INTERVAL="lo,hi" measures the guidance-interval speed mode
    # (CFG only inside the sigma band; bare conditional elsewhere) — an
    # opt-in approximation, never the driver's default number.
    gi = os.environ.get("GCD_GUIDANCE_INTERVAL")
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
        guidance_interval=tuple(map(float, gi.split(","))) if gi else None,
    )

    b = batch
    bt = 2 * b * T
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((bt, HL, WL, 8), jnp.bfloat16),
            jnp.zeros((bt,)),
            jnp.zeros((bt, 1, 1024)),
            jnp.zeros((bt, 768 + 128)),
            num_video_frames=T,
            image_only_indicator=jnp.zeros((2 * b, T)),
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

    decoder, dparams = make_decoder()

    ioi2 = jnp.zeros((2 * b, T))

    # Measured-good default compiler options + GCD_XLA_OPTS overrides, e.g.
    #   GCD_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=65536,..." python bench.py
    # (client-side XLA_FLAGS are rejected by the axon tunnel build; per-jit
    # compiler_options are forwarded to the remote compiler and do apply).
    import functools

    from gcd_tpu.ops.dispatch import default_compiler_options

    opts = default_compiler_options(bt)
    if opts:
        log(f"compiler_options: {opts}")

    @functools.partial(jax.jit, compiler_options=opts)
    def run_clip(uparams, dparams, key):
        def network(x, c_noise, cond, **extra):
            xin = jnp.concatenate(
                [x.astype(jnp.bfloat16), cond["concat"].astype(jnp.bfloat16)],
                axis=-1,
            )
            # slice the indicator to the incoming batch: the guidance-interval
            # plain branch runs at half the CFG batch
            return model.apply(
                uparams, xin, c_noise, cond["crossattn"], cond["vector"],
                num_video_frames=T, image_only_indicator=ioi2[:x.shape[0] // T],
            ).astype(jnp.float32)

        def denoise_fn(x, sigma, cond):
            return denoiser(network, x, sigma, cond)

        cond = {
            "crossattn": jnp.zeros((b * T, 1, 1024)),
            "vector": jnp.zeros((b * T, 768 + 128)),
            "concat": jnp.zeros((b * T, HL, WL, 4)),
        }
        uc = {
            "crossattn": jnp.zeros((b * T, 1, 1024)),
            "vector": jnp.zeros((b * T, 768 + 128)),
            "concat": jnp.zeros((b * T, HL, WL, 4)),
        }
        noise = jax.random.normal(key, (b * T, HL, WL, 4), dtype=jnp.float32)
        z = sampler(denoise_fn, noise, cond, uc, key=key)
        # GCD_DECODE_GN_STATS=1: A/B knob scoping the Pallas GN-stats kernel
        # to the DECODE leg only (kernel_flags is a trace-time context, so
        # the sampling scan above keeps the default lowering). The global
        # flip lost e2e in round 2 (4.78 vs 5.10); the decode leg's layout
        # behavior is different, so it gets its own measurement.
        from gcd_tpu.ops.dispatch import kernel_flags as _kf
        dec_gn = os.environ.get("GCD_DECODE_GN_STATS")
        with _kf(**({"gn_stats_pallas": dec_gn == "1"} if dec_gn else {})):
            frames = decoder.apply(dparams,
                                   (z / 0.18215).astype(jnp.bfloat16),
                                   timesteps=T)
        return frames.astype(jnp.float32)

    # Program-level kernel policy for this (CFG-doubled) batch extent —
    # the PERF_BATCH batch-4 XLA layout-pathology mitigation (see
    # dispatch.program_flag_overrides). The flags wrap the CALL so the jit
    # trace happens inside the thread-local context.
    from gcd_tpu.ops.dispatch import kernel_flags, program_flag_overrides

    overrides = program_flag_overrides(bt, opts)
    if overrides:
        log(f"program kernel overrides for bt={bt}: {overrides}")

        def run_with_policy(key):
            with kernel_flags(**overrides):
                return run_clip(uparams, dparams, key)

        # keep the AOT hooks used by profile/mem-analysis tools
        run_with_policy.func, run_with_policy.args = run_clip, (uparams, dparams)
        run_with_policy.kernel_overrides = overrides
        return run_with_policy
    return functools.partial(run_clip, uparams, dparams)


def _rel_err(a, b) -> float:
    a = jnp.asarray(a, jnp.float32).ravel()
    b = jnp.asarray(b, jnp.float32).ravel()
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-30))


def kernel_numerics_check(tol: float = 1e-2) -> dict:
    """GCD_BENCH_CHECK=1: run each default-enabled Pallas kernel against its
    XLA fallback on one real batch ON-DEVICE and record the relative L2 error.

    The CPU test suite exercises the kernels' interpret/fallback paths only
    (VERDICT r2 Missing #6) — a silent on-device Mosaic miscompile would ship
    a fast wrong number. This gate runs on the same device as the timing and
    folds the result into the bench JSON line. Raises on tolerance violation
    so the supervisor reports a deterministic failure instead of a number.
    """
    from gcd_tpu.ops.dispatch import _ENV

    # GCD_* dispatch env vars take precedence over the thread-local flag
    # stack (dispatch.kernel_enabled), so e.g. GCD_FLASH=1 would make BOTH
    # sides of an A/B trace the Pallas path and the gate pass vacuously
    # (ADVICE r3 #3). Strip them for the duration of the check; the check
    # runs after timing, so the measured configuration is unaffected.
    saved_env = {v: os.environ.pop(v) for v in _ENV.values()
                 if v in os.environ}
    if saved_env:
        log(f"kernel check: temporarily clearing {sorted(saved_env)} so "
            "the A/B flags control both sides")
    try:
        return _kernel_numerics_check_inner(tol)
    finally:
        os.environ.update(saved_env)


def _kernel_numerics_check_inner(tol: float) -> dict:
    from gcd_tpu.ops.attention import dot_product_attention
    from gcd_tpu.ops.dispatch import kernel_flags
    from gcd_tpu.ops.fused_mlp import geglu_mlp
    from gcd_tpu.ops.flash_attention import resolve_probes
    from gcd_tpu.ops.temporal_attention import temporal_attention
    from gcd_tpu.ops.temporal_conv import temporal_conv_k11

    # Resolve the flash-backward probe with a clean standalone compile
    # BEFORE any grad tracing: a probe issued mid-trace can fail on the
    # remote compile helper and silently disable the kernel, turning the
    # flash_bwd A/B below vacuous (both sides XLA). The hardened program-
    # differs assert would catch it; resolving here prevents it.
    with kernel_flags(flash_bwd=True):
        if not resolve_probes(force=True):
            raise AssertionError(
                "flash backward kernel probe failed standalone — cannot run "
                "a meaningful flash_bwd numerics A/B")

    keys = jax.random.split(jax.random.PRNGKey(42), 12)
    rnd = lambda i, shape: jax.random.normal(keys[i], shape, jnp.bfloat16)
    errs = {}

    programs = {}

    def ab(name, fn, **flags):
        """Trace fn twice — Pallas path vs XLA fallback (flags off).

        Besides the numeric delta, assert the two traced programs actually
        DIFFER (VERDICT r4 weak #8): a shape-gated or probe-gated dispatch
        silently falling back on both sides would trace the identical
        program and report a meaningless 0.0 — indistinguishable from a
        true parity result. Lowered StableHLO text is deterministic for a
        fixed trace, so byte-identical text == vacuous A/B."""
        with kernel_flags(**{k: True for k in flags}):
            fa = jax.jit(lambda: fn())
            text_a = fa.lower().as_text()
            a = fa()
        with kernel_flags(**{k: False for k in flags}):
            fb = jax.jit(lambda: fn())
            text_b = fb.lower().as_text()
            b = fb()
        if text_a == text_b:
            raise AssertionError(
                f"kernel numerics A/B '{name}' is VACUOUS: both flag "
                f"settings ({sorted(flags)}) lowered byte-identical "
                "programs — the kernel path never traced (shape gate or "
                "probe fallback?), so its numerics are unchecked")
        programs[name] = (text_a, text_b)
        pairs = zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        errs[name] = max(_rel_err(x, y) for x, y in pairs)

    # Spatial flash attention at the UNet ds2 shape ((B,S,H,D), CFG-doubled).
    q, k, v = (rnd(0, (28, 384, 5, 64)), rnd(1, (28, 384, 5, 64)),
               rnd(2, (28, 384, 5, 64)))
    ab("flash", lambda: dot_product_attention(q, k, v, use_flash=None), flash=True)

    # Flash backward kernel vs XLA-recompute backward (same fwd kernel).
    def attn_grads():
        f = lambda q_, k_, v_: dot_product_attention(q_, k_, v_).astype(
            jnp.float32).sum()
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    ab("flash_bwd", attn_grads, flash_bwd=True)

    # Fused GEGLU MLP at the ds1 transformer width (C=320, inner=1280).
    x = rnd(3, (8192, 320))
    w1, b1 = rnd(4, (320, 2560)) * 0.05, rnd(5, (2560,)) * 0.05
    w2, b2 = rnd(6, (1280, 320)) * 0.05, rnd(7, (320,)) * 0.05
    ab("fused_mlp", lambda: geglu_mlp(x, w1, b1, w2, b2), fused_mlp=True)

    # Pallas temporal attention ((B*T, S, C) layout, T=14).
    q3, k3, v3 = (rnd(8, (28, 384, 320)), rnd(9, (28, 384, 320)),
                  rnd(10, (28, 384, 320)))
    ab("tattn_pallas",
       lambda: temporal_attention(q3, k3, v3, timesteps=T, heads=5),
       tattn_pallas=True)

    # Temporal (3,1,1) conv: im2col matmul vs XLA 3D conv.
    xt = rnd(11, (1, T, 32, 48, 512))
    kern = rnd(0, (3, 1, 1, 512, 512)) * 0.05

    def tconv_xla(x_, k_):
        import jax.lax as lax

        return lax.conv_general_dilated(
            x_, k_, window_strides=(1, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    fa, fb = jax.jit(temporal_conv_k11), jax.jit(tconv_xla)
    text_a, text_b = (fa.lower(xt, kern).as_text(),
                      fb.lower(xt, kern).as_text())
    if text_a == text_b:
        raise AssertionError(
            "kernel numerics A/B 'tconv_matmul' is VACUOUS: the im2col "
            "matmul and the XLA 3D conv lowered byte-identical programs")
    a, b = fa(xt, kern), fb(xt, kern)
    # A 0.0 here is REAL, not vacuous (the assert above proved the two
    # programs differ): XLA lowers this (3,1,1) conv to the same bf16
    # matmul-with-f32-accumulation contraction the im2col kernel issues, so
    # the results agree bitwise on TPU (verified round 5).
    errs["tconv_matmul"] = _rel_err(a, b)

    bad = {k: v for k, v in errs.items() if not v <= tol}
    if bad:
        raise AssertionError(
            f"on-device kernel numerics check FAILED (tol {tol}): {bad}")
    log(f"kernel numerics check (on-device, tol {tol}): "
        + ", ".join(f"{k}={v:.2e}" for k, v in errs.items()))
    return {k: round(v, 6) for k, v in errs.items()}


def _make_run_clip_for_export(batch: int = 1):
    """(jitted_fn, uparams, dparams) for jax.export (scripts/bench_cold_start
    .py): the bench clip program with params as ARGUMENTS so the serialized
    artifact stays megabytes — weights load from the checkpoint store at
    serving time (engine/export.py module docstring)."""
    part = build_sampler_fn(batch)
    return part.func, part.args[0], part.args[1]


def build_train_step():
    """(step, uparams, opt_state) for the flagship training step — frozen-VAE
    encode of target + cond frames, denoiser v-loss fwd+bwd through the
    remat'd 1.5B-param UNet at bt=14, Adam update. step(uparams, opt_state,
    frames, cond_frames, key) -> (uparams, opt_state, loss), jitted with
    donated carry and the production trainer's kernel flags
    (engine/trainer.py). Shared by run_train_inner (synthetic input) and
    scripts/bench_train_e2e.py (live PrefetchLoader input).

    Single-chip memory note: f32 master-weight Adam on 1.5B params needs
    ~18 GB (that is the multi-chip FSDP configuration, parallel/mesh.py);
    this bench holds params and both Adam moments in bf16 (~9.3 GB) — the
    reference's own recipe similarly drops EMA to fit (README "Training").
    """
    import optax

    from __graft_entry__ import _flagship_unet
    from gcd_tpu.diffusion import Denoiser
    from gcd_tpu.models.vae import Encoder
    from gcd_tpu.ops.dispatch import kernel_flags

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    bt = T  # one clip per step, (B*T) collate convention
    model = _flagship_unet(dtype=jnp.bfloat16)
    model = model.clone(use_checkpoint=True)
    denoiser = Denoiser(
        {"target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"}
    )
    encoder = Encoder(dtype=jnp.bfloat16)

    def rand_params(shapes, seed):
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        ks = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        return jax.tree_util.tree_unflatten(treedef, [
            jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02
            for k, l in zip(ks, leaves)
        ])

    ushapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((bt, HL, WL, 8), jnp.bfloat16),
            jnp.zeros((bt,)),
            jnp.zeros((bt, 1, 1024)),
            jnp.zeros((bt, 768 + 128)),
            num_video_frames=T,
            image_only_indicator=jnp.zeros((1, T)),
        )
    )
    eshapes = jax.eval_shape(
        lambda: encoder.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, H, W, 3), jnp.bfloat16)))
    uparams = jax.jit(lambda: rand_params(ushapes, 1))()
    eparams = jax.jit(lambda: rand_params(eshapes, 2))()

    opt = optax.adam(2e-5, mu_dtype=jnp.bfloat16)
    opt_state = jax.jit(opt.init)(uparams)

    crossattn = jnp.zeros((bt, 1, 1024), jnp.bfloat16)
    vector = jnp.zeros((bt, 768 + 128), jnp.bfloat16)
    ioi = jnp.zeros((1, T))

    def step(uparams, opt_state, frames, cond_frames, key):
        # Frozen first stage: encode target + noisy-cond frames (both legs of
        # the reference's shared_step run no-grad, diffusion.py:253-266).
        to_latent = lambda x: encoder.apply(
            eparams, x)[..., :4].astype(jnp.float32) * 0.18215
        latents = jax.lax.stop_gradient(to_latent(frames))
        concat = jax.lax.stop_gradient(to_latent(cond_frames))

        ksig, knoise = jax.random.split(key)
        # EDM lognormal sigma, harmonized: ONE sigma per video (loss.py:131).
        sigma = jnp.exp(jax.random.normal(ksig, ()) * 1.6 + 1.0)
        sigma = jnp.full((bt,), sigma)
        noise = jax.random.normal(knoise, latents.shape, jnp.float32)
        noised = latents + noise * sigma[:, None, None, None]

        def loss_fn(uparams):
            def network(x, c_noise, cond, **extra):
                xin = jnp.concatenate(
                    [x.astype(jnp.bfloat16), cond["concat"].astype(jnp.bfloat16)],
                    axis=-1)
                return model.apply(
                    uparams, xin, c_noise, cond["crossattn"], cond["vector"],
                    num_video_frames=T, image_only_indicator=ioi,
                ).astype(jnp.float32)

            cond = {"crossattn": crossattn, "vector": vector, "concat": concat}
            denoised = denoiser(network, noised, sigma, cond)
            w = (sigma ** 2 + 1.0) / sigma ** 2  # VWeighting, sigma_data=1
            return (w[:, None, None, None] * (denoised - latents) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(uparams)
        updates, opt_state = opt.update(grads, opt_state, uparams)
        uparams = optax.apply_updates(uparams, updates)
        return uparams, opt_state, loss

    # Resolve the flash-backward probe with a clean standalone compile
    # before the big grad trace (see ops/flash_attention.resolve_probes —
    # a mid-trace probe failure silently downgrades the whole grad program
    # to the XLA-recompute backward).
    from gcd_tpu.ops.flash_attention import resolve_probes

    with kernel_flags(flash_bwd=True):
        bwd_ok = resolve_probes()
    log(f"flash backward kernel available: {bwd_ok}")

    # GCD_XLA_OPTS A/B hook for the GRAD program (the inference-side
    # bundle-cost-model default is NOT applied here until its training A/B
    # is measured; see dispatch.default_compiler_options).
    topts = None
    if os.environ.get("GCD_XLA_OPTS"):
        topts = dict(kv.split("=", 1)
                     for kv in os.environ["GCD_XLA_OPTS"].split(","))
        log(f"train compiler_options: {topts}")
    jstep = jax.jit(step, donate_argnums=(0, 1), compiler_options=topts)

    def flagged_step(uparams, opt_state, frames, cond_frames, key):
        # Match the production trainer's trace configuration: tattn Pallas
        # is disabled in grad programs because it measures SLOWER there
        # (396.0 vs 383.3 ms/step on v5e — recompute custom_vjp cost;
        # engine/trainer.py make_jitted_train_step). GCD_TATTN_PALLAS=1
        # still overrides for A/B runs.
        from gcd_tpu.ops.dispatch import TRAIN_TRACE_FLAGS

        with kernel_flags(**TRAIN_TRACE_FLAGS):
            return jstep(uparams, opt_state, frames, cond_frames, key)

    return flagged_step, uparams, opt_state


def run_train_inner():
    """GCD_BENCH_TRAIN=1: time the full flagship training step on this chip
    with synthetic (zero-stall) input. (VERDICT r2 Missing #4: README's
    380 ms/step had no recorded artifact.)"""
    bt = T
    jstep, uparams, opt_state = build_train_step()
    frames = jax.random.normal(jax.random.PRNGKey(3), (bt, H, W, 3),
                               jnp.bfloat16) * 0.5
    cond_frames = jax.random.normal(jax.random.PRNGKey(4), (bt, H, W, 3),
                                    jnp.bfloat16) * 0.5
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    uparams, opt_state, loss = jstep(uparams, opt_state, frames,
                                     cond_frames, key)
    jax.block_until_ready(loss)
    log(f"train compile+first step: {time.time()-t0:.1f}s, loss {float(loss):.4f}")

    times = []
    for i in range(5):
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        uparams, opt_state, loss = jstep(uparams, opt_state, frames,
                                         cond_frames, k)
        jax.block_until_ready(loss)
        times.append(time.time() - t0)

    ms = min(times) * 1e3
    p50 = sorted(times)[len(times) // 2] * 1e3
    log(f"train step times: {['%.0f' % (t*1e3) for t in times]} ms -> "
        f"{ms:.1f} ms/step, {bt / (ms / 1e3):.1f} training frames/s")
    print(json.dumps({
        "metric": ("train ms/step: flagship 1.5B UNet bt=14 remat fwd+bwd "
                   "+ frozen-VAE encode (target+cond) + Adam (bf16 moments)"),
        "value": round(ms, 1),
        "unit": "ms/step",
        "p50_ms": round(p50, 1),
        "train_frames_per_sec_per_chip": round(bt / (ms / 1e3), 2),
        "chip": jax.devices()[0].device_kind,
    }))


def run_inner():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    # Serving-throughput mode: GCD_BENCH_BATCH=N packs N clips per program.
    # The driver metric is the default N=1 (the reference's per-clip
    # latency-bound workload); N>1 measures frames/s/chip when requests are
    # batched, the production-serving configuration.
    batch = int(os.environ.get("GCD_BENCH_BATCH", "1"))
    run_clip = build_sampler_fn(batch)
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
    fps = batch * T / clip_time
    log(f"batch {batch} clip times: {['%.2f' % t for t in times]} -> "
        f"{fps:.2f} frames/s, p50 batch latency {p50:.2f}s")

    result = {
        "metric": "frames/sec/chip, 14f 384x256 25-step EulerEDM + VAE decode",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_EST_FRAMES_PER_SEC, 3),
        "p50_clip_latency_s": round(p50, 3),
        # BASELINE.md's >=5x north star is quoted for v5p chips; this env's
        # single chip is the much smaller v5e-lite (VERDICT r1 weak #4).
        "chip": jax.devices()[0].device_kind,
        # The reference publishes no wall-clock numbers; the denominator is
        # estimated from community SVD timings (module docstring). Carry the
        # caveat in the artifact itself, not just the README (VERDICT r2
        # weak #7).
        "baseline_note": "A100 denominator is an estimate (no published "
                         "reference wall-clock); see bench.py docstring",
    }
    if batch != 1:
        result["clips_per_batch"] = batch
    # Self-certifying bench (VERDICT r3 #4): the on-device kernel numerics
    # gate is DEFAULT-ON for the driver's batch-1 configuration (it runs
    # after timing, never altering the metric; GCD_BENCH_CHECK=0 disables).
    # Batch-sweep runs (batch>1) keep it opt-in to preserve sweep budget —
    # the kernels are identical programs at every batch size.
    check_default = "1" if batch == 1 else "0"
    if os.environ.get("GCD_BENCH_CHECK", check_default) != "0":
        result["kernels_check"] = kernel_numerics_check()
        result["kernels_check_ok"] = True
    print(json.dumps(result))


# --------------------------------------------------------------------------
# Supervisor: wedge-resilient wrapper (no jax device use in this process).
# --------------------------------------------------------------------------

_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_last_good.json")


def _probe_once(i: int, timeout_s: float = 150.0) -> bool:
    """Fresh-shape compile probe in its own subprocess.

    A new shape per probe defeats compile caches (same-shape probes can
    succeed from cache while the compiler is wedged). Run out-of-process so a
    hang costs only the timeout, not this supervisor.
    """
    code = (
        "import jax, jax.numpy as jnp\n"
        f"x = jnp.ones((8, {128 + 8 * (i % 4096)}))\n"
        "print(jax.jit(lambda a: (a @ a.T).sum())(x))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _parse_result(stdout: str):
    for line in reversed((stdout or "").strip().splitlines()):
        try:
            d = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(d, dict) and "metric" in d and "value" in d:
            return d
    return None


def _is_default_config() -> bool:
    """True when no GCD_* experiment knob is set — only then may a run update
    the stale-fallback record (a GCD_XLA_OPTS/GCD_SUBPIX_UP/... A/B measuring
    a deliberately different configuration must not poison it)."""
    harness_knobs = {"GCD_BENCH_BUDGET_S", "GCD_BENCH_INNER_TIMEOUT_S",
                     "GCD_JAX_CACHE",
                     # The numerics gate runs AFTER timing and does not alter
                     # the measured configuration — its runs stay eligible to
                     # refresh the stale-fallback record.
                     "GCD_BENCH_CHECK"}
    return not any(k.startswith("GCD_") and k not in harness_knobs
                   for k in os.environ)


def _emit_fallback_and_exit(rc_if_missing: int = 1) -> int:
    """Print the most recent good result marked stale (or an error line) —
    shared by budget exhaustion and the SIGTERM path, so an impatient parent
    killing the supervisor still gets a parseable driver line."""
    if os.environ.get("GCD_BENCH_TRAIN"):
        # Train mode has no stale-fallback record (it writes PERF_TRAIN.json
        # on success); never launder the clip metric into a train result.
        print(json.dumps({
            "metric": "train ms/step: flagship 1.5B UNet bt=14",
            "value": 0.0, "unit": "ms/step",
            "error": "no successful train-bench run within the budget",
        }), flush=True)
        return rc_if_missing
    if os.path.exists(_LAST_GOOD):
        with open(_LAST_GOOD) as f:
            d = json.load(f)
        d["stale"] = True
        d["note"] = ("no successful run within the bench budget (TPU wedged "
                     "or slow); value is the most recent successful run of "
                     "this same benchmark")
        print(json.dumps(d), flush=True)
        return 0
    print(json.dumps({
        "metric": "frames/sec/chip, 14f 384x256 25-step EulerEDM + VAE decode",
        "value": 0.0,
        "unit": "frames/sec/chip",
        "vs_baseline": 0.0,
        "error": "TPU unavailable for the entire bench budget; no prior run recorded",
    }), flush=True)
    return rc_if_missing


def supervise() -> int:
    import signal

    def on_term(signum, frame):
        log(f"[bench] signal {signum} — emitting fallback line before exit")
        sys.exit(_emit_fallback_and_exit())

    # Restore the caller's handler on return: the supervisor tests call
    # supervise() in-process, and a leaked handler turns any later SIGTERM
    # to that process (e.g. a pytest-level timeout) into a confusing
    # SystemExit from inside unrelated code.
    prev_handler = signal.signal(signal.SIGTERM, on_term)
    try:
        return _supervise_loop()
    finally:
        signal.signal(signal.SIGTERM, prev_handler)


def _supervise_loop() -> int:
    budget_s = float(os.environ.get("GCD_BENCH_BUDGET_S", 2700))
    inner_timeout_s = float(os.environ.get("GCD_BENCH_INNER_TIMEOUT_S", 1200))
    deadline = time.time() + budget_s
    attempt = 0
    fast_failures_with_live_tpu = 0
    while time.time() < deadline:
        attempt += 1
        log(f"[bench] attempt {attempt}, {deadline - time.time():.0f}s of budget left")
        try:
            t_start = time.time()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                timeout=max(60.0, min(inner_timeout_s, deadline - time.time())),
                capture_output=True, text=True,
            )
            inner_elapsed = time.time() - t_start
            if r.stderr:
                log(r.stderr[-4000:])
            d = _parse_result(r.stdout) if r.returncode == 0 else None
            if d is not None:
                if os.environ.get("GCD_BENCH_TRAIN"):
                    # Record the training-step artifact (VERDICT r2 #5).
                    path = os.path.join(os.path.dirname(_LAST_GOOD),
                                        "PERF_TRAIN.json")
                    with open(path, "w") as f:
                        json.dump(d, f, indent=1)
                    log(f"[bench] wrote {path}")
                elif "clips_per_batch" not in d and _is_default_config():
                    # Only the driver's default single-clip config may update
                    # the stale-fallback record.
                    with open(_LAST_GOOD, "w") as f:
                        json.dump(d, f)
                print(json.dumps(d))
                return 0
            log(f"[bench] inner run failed (rc={r.returncode})")
            # A quick failure while the tunnel answers probes is a program
            # bug, not a wedge — don't launder it into a stale result.
            if inner_elapsed < 120 and _probe_once(attempt * 131 + 7):
                fast_failures_with_live_tpu += 1
                log(f"[bench] tunnel is responsive yet the bench failed fast "
                    f"({fast_failures_with_live_tpu}x) — likely a real bug")
                if fast_failures_with_live_tpu >= 3:
                    train = bool(os.environ.get("GCD_BENCH_TRAIN"))
                    print(json.dumps({
                        "metric": ("train ms/step: flagship 1.5B UNet bt=14"
                                   if train else
                                   "frames/sec/chip, 14f 384x256 25-step "
                                   "EulerEDM + VAE decode"),
                        "value": 0.0,
                        "unit": "ms/step" if train else "frames/sec/chip",
                        "vs_baseline": 0.0,
                        "error": ("bench failed repeatedly while the TPU "
                                  "answered probes — deterministic failure, "
                                  "see stderr"),
                    }))
                    return 1
                continue
        except subprocess.TimeoutExpired as e:
            tail = (e.stderr or b"")[-2000:] if isinstance(e.stderr, bytes) else (e.stderr or "")[-2000:]
            log(f"[bench] inner run timed out; stderr tail: {tail}")
        # Tunnel presumed wedged: poll with fresh-shape probes until it
        # responds (self-recovery is typically 1-5 min), then retry.
        probe_i = attempt * 500
        while time.time() < deadline:
            probe_i += 1
            if _probe_once(probe_i):
                log("[bench] probe OK — tunnel responsive, retrying bench")
                break
            log("[bench] probe failed — sleeping 60s")
            time.sleep(60)
    # Budget exhausted without a successful run.
    return _emit_fallback_and_exit()


if __name__ == "__main__":
    if "--inner" in sys.argv:
        if os.environ.get("GCD_BENCH_TRAIN"):
            run_train_inner()
        else:
            run_inner()
    else:
        sys.exit(supervise())
