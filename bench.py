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

    # Optional XLA compiler-option overrides, e.g.
    #   GCD_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=65536,..." python bench.py
    # (client-side XLA_FLAGS are rejected by the axon tunnel build; per-jit
    # compiler_options are forwarded to the remote compiler and do apply).
    import functools

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
        frames = decoder.apply(dparams, (z / 0.18215).astype(jnp.bfloat16),
                               timesteps=T)
        return frames.astype(jnp.float32)

    return functools.partial(run_clip, uparams, dparams)


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
    }
    if batch != 1:
        result["clips_per_batch"] = batch
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
                     "GCD_JAX_CACHE"}
    return not any(k.startswith("GCD_") and k not in harness_knobs
                   for k in os.environ)


def _emit_fallback_and_exit(rc_if_missing: int = 1) -> int:
    """Print the most recent good result marked stale (or an error line) —
    shared by budget exhaustion and the SIGTERM path, so an impatient parent
    killing the supervisor still gets a parseable driver line."""
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

    signal.signal(signal.SIGTERM, on_term)

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
                if "clips_per_batch" not in d and _is_default_config():
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
                    print(json.dumps({
                        "metric": ("frames/sec/chip, 14f 384x256 25-step "
                                   "EulerEDM + VAE decode"),
                        "value": 0.0, "unit": "frames/sec/chip",
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
        run_inner()
    else:
        sys.exit(supervise())
