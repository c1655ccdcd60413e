"""Central kernel-dispatch flags for the Pallas/XLA path choices.

Round 1 scattered per-kernel env-var reads across the ops modules and the
trainer mutated `os.environ["GCD_TATTN_PALLAS"]` around its jitted call —
process-global, thread-unsafe state (ADVICE.md round-1, VERDICT.md "Next
round" #9). This module is now the single source of truth:

  * defaults live in _DEFAULTS;
  * code overrides them explicitly and thread-locally via
    `with kernel_flags(tattn_pallas=False): ...` (nestable; innermost wins);
  * the env vars remain as USER overrides only, taking precedence over both
    (so `GCD_FLASH=0 python ...` still force-disables a kernel everywhere,
    and `GCD_TATTN_PALLAS=1` can force it back on inside the trainer).

Flag -> env var -> meaning:
  flash         GCD_FLASH         Pallas flash spatial attention (ops/attention.py)
  flash_bwd     GCD_FLASH_BWD     fused flash backward kernel (ops/flash_attention.py)
  fused_mlp     GCD_FUSED_MLP     fused GEGLU MLP kernel (ops/fused_mlp.py)
  tattn_pallas  GCD_TATTN_PALLAS  Pallas temporal attention (ops/temporal_attention.py)
  fused_gn      GCD_FUSED_GN      Pallas GroupNorm (ops/fused_norm.py; opt-in)
  fused_gn_conv GCD_FUSED_GNCONV  GN->SiLU->conv3x3 kernel (models/resblock.py; opt-in,
                                  parked: loses e2e to XLA epilogue fusions)
  exact_gelu    GCD_EXACT_GELU    erf GELU inside fused kernels instead of tanh
                                  (numerics A/B switch, not a kernel toggle)
  tconv_matmul  GCD_TCONV_MATMUL  (kt,1,1) temporal convs as im2col matmuls
                                  (ops/temporal_conv.py)
  tconv_split   GCD_TCONV_SPLIT   big-shape temporal convs as one channel-
                                  concatenated matmul + shifted-add epilogue
                                  instead of the lax 3D conv
                                  (ops/temporal_conv.py temporal_conv_k11_split;
                                  parked: decode leg measured 228 vs 156 ms —
                                  the kt*Co output materialization costs more
                                  than the 3D conv's relayout copies it avoids)
  gn_stats_pallas GCD_GN_STATS    GroupNorm statistics via an opaque Pallas
                                  kernel, keeping conv epilogues clean
                                  (ops/fused_norm.py group_stats_pallas;
                                  measured 4.78 vs 5.12 f/s e2e - stays off)
  sconv_matmul  GCD_SCONV_MATMUL  spatial 3x3 convs as im2col matmuls
                                  (ops/spatial_conv.py; measured 3.80 vs
                                  5.10 f/s e2e - XLA materializes the 9x
                                  concat for 2D shifts - stays off)
  subpix_upsample GCD_SUBPIX_UP   nearest-2x upsample folded into the next
                                  3x3 conv as a 4-phase 2x2 conv, 2.25x
                                  fewer MACs (ops/subpixel.py)
  flash_pack2   GCD_FLASH_PACK2   pack two 64-dim heads into one 128-lane
                                  MXU contraction inside the flash forward
                                  (block-diagonal zero-packed K/V;
                                  ops/flash_attention.py _mh_kernel)
  tattn_pack2   GCD_TATTN_PACK2   the same head-pair packing inside the
                                  temporal-attention kernel's per-pack
                                  matmuls (ops/temporal_attention.py)
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

_DEFAULTS = {
    "flash": True,
    "flash_bwd": True,
    "fused_mlp": True,
    "tattn_pallas": True,
    "fused_gn": False,
    "fused_gn_conv": False,
    "exact_gelu": False,
    "tconv_matmul": True,
    "tconv_split": False,
    "gn_stats_pallas": False,
    "sconv_matmul": False,
    # Round-2 verdict was neutral (2740 vs 2737 ms); under the round-5
    # bundle-aware-cost-model default the fold now WINS: 5.55/5.54 f/s
    # (clips 2.52-2.54 s) vs 5.51/5.52 default (2.54-2.57), two runs per
    # side, every iteration faster. Exact-parity tests in test_subpixel.py.
    "subpix_upsample": True,
    # e2e A/B on v5e (round 5, serialized same-day runs, 5 clips each):
    # pack2 5.354 f/s (clips 2.61-2.63 s) vs default 5.334 f/s (2.62-2.64 s)
    # -> +0.4%, every iteration faster; numerics A/B in the bench gate.
    "flash_pack2": True,
    # e2e A/B on v5e (round 5): ON 5.405 f/s (clips 2.59-2.62 s) vs OFF
    # 5.352 (2.62-2.63) -> +1.0%, every iteration faster.
    "tattn_pack2": True,
}

_ENV = {
    "flash": "GCD_FLASH",
    "flash_bwd": "GCD_FLASH_BWD",
    "fused_mlp": "GCD_FUSED_MLP",
    "tattn_pallas": "GCD_TATTN_PALLAS",
    "fused_gn": "GCD_FUSED_GN",
    "fused_gn_conv": "GCD_FUSED_GNCONV",
    "exact_gelu": "GCD_EXACT_GELU",
    "tconv_matmul": "GCD_TCONV_MATMUL",
    "tconv_split": "GCD_TCONV_SPLIT",
    "gn_stats_pallas": "GCD_GN_STATS",
    "sconv_matmul": "GCD_SCONV_MATMUL",
    "subpix_upsample": "GCD_SUBPIX_UP",
    "flash_pack2": "GCD_FLASH_PACK2",
    "tattn_pack2": "GCD_TATTN_PACK2",
}

_tls = threading.local()


def _stack():
    stack = getattr(_tls, "stack", None)
    if stack is None:
        stack = _tls.stack = []
    return stack


def kernel_enabled(name: str) -> bool:
    """Effective value of a dispatch flag for the calling thread."""
    explicit = kernel_setting(name)
    return _DEFAULTS[name] if explicit is None else explicit


def kernel_setting(name: str):
    """The EXPLICIT value of a flag (env var or thread-local kernel_flags),
    or None when neither is set. Lets shape-aware auto-rules (e.g. the
    GroupNorm-stats layout guard in ops/fused_norm.py) defer to any explicit
    user/caller choice while still overriding the plain default."""
    env = os.environ.get(_ENV[name])
    if env is not None and env != "":
        return env != "0"
    for frame in reversed(_stack()):
        if name in frame:
            return frame[name]
    return None


_BUNDLE_FLAG = "xla_tpu_use_bundle_aware_cost_model_for_fusions"

# Trace-time flag overrides for TRAINING (grad) programs — the production
# trainer (engine/trainer.py make_jitted_train_step), the train bench
# (bench.build_train_step) and the full-size SPMD compile test all trace
# under these, so they compile the same program:
#   tattn_pallas=False    — the recompute custom_vjp costs more in grad than
#                           the forward kernel saves (396.0 vs 383.3 ms/step)
#   subpix_upsample=False — inference-only win (5.55 vs 5.51 f/s);
#                           training-neutral (370.0 vs 367.2 ms) AND the
#                           rewritten upsample graph perturbs GSPMD sharding
#                           propagation in the full-size 8-device grad
#                           program (one involuntary-full-remat warning,
#                           tests/test_spmd_fullsize.py)
TRAIN_TRACE_FLAGS = {"tattn_pallas": False, "subpix_upsample": False}


def default_compiler_options(bt_extent: int | None = None,
                             extra: dict | None = None):
    """Measured-good XLA compiler options for the big jitted INFERENCE
    programs (bench clip, serving server, sharded sampler).

    v5e e2e A/B (round 5, 5-clip runs, INVENTORY attack log + PERF_BATCH
    v2): `xla_tpu_use_bundle_aware_cost_model_for_fusions=true` 5.515 vs
    5.405 f/s at batch 1 (+2%, every clip faster), 5.293 at extent 56,
    4.84 at extent 112 (where it also dissolves the round-4 layout
    pathology: 1.06 -> 4.84 with no Pallas-stats patch needed) — but at
    extent 224 (8 clips) its fusion strategy OVERFLOWS HBM by ~315 MB
    (16.06 G used of 15.75, 2x reproduced incl. the gn_stats variant), so
    the flag is dropped there (4.871 f/s without it, the measured best).
    `bt_extent` is the program's CFG-doubled batch-time extent; pass None
    when unknown/small (e.g. the sharded sampler, whose per-chip slice is
    extent/n_chips). Applied only on the TPU backend — XLA:CPU rejects TPU
    flags. GCD_XLA_OPTS merges ON TOP (user wins per key);
    GCD_DEFAULT_XLA_OPTS=0 kill-switches the defaults. Training programs
    are NOT wired here until the grad-program A/B is measured.

    Returns a dict for `jax.jit(compiler_options=...)`, or None off-TPU.
    """
    from gcd_tpu.ops.attention import _is_tpu_backend

    if not _is_tpu_backend():
        return None
    opts = {}
    if (os.environ.get("GCD_DEFAULT_XLA_OPTS", "1") != "0"
            and not (bt_extent is not None and bt_extent >= 224)):
        opts[_BUNDLE_FLAG] = "true"
    if os.environ.get("GCD_XLA_OPTS"):
        opts.update(kv.split("=", 1)
                    for kv in os.environ["GCD_XLA_OPTS"].split(","))
    if extra:
        opts.update(extra)
    return opts or None


def program_flag_overrides(batch_time_extent: int,
                           compiler_options: dict | None = None) -> dict:
    """Measured program-level kernel policy for a sampling/serving program
    whose flattened CFG-doubled batch-time extent is `batch_time_extent`.

    PERF_BATCH.json batch-4 diagnosis (round 4): at extent 112 (4 clips x
    14 frames x2 CFG) XLA's layout assignment gives three ds1 GroupNorm-
    stats fusions (input bf16[112,32,48,320]) a batch-minormost layout
    {0,3,2,1} that executes at 0.6 GiB/s — ~41 s of the 52.6 s clip —
    while identical-shape stats fusions in the same program run at 58-75
    GiB/s. Tracing the WHOLE program with the opaque Pallas GN-stats
    kernel (gn_stats_pallas) forces sane layouts: 1.065 -> 4.49
    frames/s/chip measured e2e. Site-scoped variants of the fix were
    rejected (see ops/fused_norm.py); only the whole-program flip is
    measured-good.

    Round-5 refinement (PERF_BATCH v2 sweep): when the program compiles
    with the bundle-aware fusion cost model (default_compiler_options),
    the extent-112 pathology does not occur and the Pallas-stats patch
    only costs (4.84 without vs 4.58 with) — so the patch applies ONLY to
    programs compiled WITHOUT that option (`compiler_options=None`, e.g.
    the eager per-op eval path and deserialized AOT artifacts, whose
    load-side compile takes backend defaults).

    Callers wrap their jitted program's first (tracing) call in
    `kernel_flags(**program_flag_overrides(bt, opts))`; an explicit
    GCD_GN_STATS env var still takes precedence over the thread-local
    flag either way.
    """
    bundle = bool(compiler_options
                  and compiler_options.get(_BUNDLE_FLAG) == "true")
    if batch_time_extent == 112 and not bundle:
        return {"gn_stats_pallas": True}
    return {}


@contextmanager
def kernel_flags(**flags: bool):
    """Thread-local flag overrides for the duration of the block.

    Affects only the calling thread: a jit trace running concurrently on
    another thread sees the defaults (or its own overrides), fixing the
    round-1 env-mutation race.
    """
    unknown = set(flags) - set(_DEFAULTS)
    if unknown:
        raise ValueError(
            f"unknown kernel flag(s) {sorted(unknown)}; "
            f"known: {sorted(_DEFAULTS)}"
        )
    stack = _stack()
    stack.append(dict(flags))
    try:
        yield
    finally:
        stack.pop()
