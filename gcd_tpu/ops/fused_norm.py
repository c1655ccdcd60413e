"""Fused GroupNorm(+SiLU) Pallas kernel.

The UNet spends a large share of its HBM traffic on GroupNorm32 islands: the
reference computes them in fp32 (diffusionmodules/util.py:274), which in the
naive lowering materializes fp32 copies of every activation (cast -> stats ->
normalize -> cast back). At GCD's UNet resolutions a whole sample's activation
map fits in VMEM (<= 1536 tokens x 1280 ch), so this kernel reads the bf16
tensor once, computes group statistics in fp32 on-chip, applies
normalize+affine(+SiLU) and writes bf16 once — one read + one write instead of
several fp32 round trips.

Training support: custom_vjp with a pure-jax backward (standard GroupNorm
gradient), so the fused forward composes with jax.grad/checkpointing.
Falls back to the unfused path on CPU or when the per-sample block exceeds
the VMEM budget (e.g. full-resolution VAE layers).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 8 * 1024 * 1024

# Tests flip this to run the stats kernel in pallas interpret mode on CPU.
_INTERPRET = False


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int, eps: float,
            silu: bool, hw: int, c: int):
    x = x_ref[...].astype(jnp.float32).reshape(hw, c)
    cpg = c // num_groups

    s1 = jnp.sum(x, axis=0, keepdims=True)      # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)  # (1, C)
    # Group reduction via a one-hot (C, G) matmul — mosaic cannot reshape the
    # lane dimension into (G, C/G), but matmuls against a static mask lower
    # cleanly to the MXU.
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cpg
    grp_id = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (ch_group == grp_id).astype(jnp.float32)  # (C, G)
    g1 = jax.lax.dot_general(s1, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (1, G)
    g2 = jax.lax.dot_general(s2, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    n = float(hw * cpg)
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # (1, G)

    mean_c = jax.lax.dot_general(mean, onehot, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jax.lax.dot_general(inv, onehot, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    scale = scale_ref[...].astype(jnp.float32).reshape(1, c)
    bias = bias_ref[...].astype(jnp.float32).reshape(1, c)
    y = (x - mean_c) * (inv_c * scale) + bias
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.reshape(x_ref.shape).astype(o_ref.dtype)


def _fused_forward(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   num_groups: int, eps: float, silu: bool) -> jnp.ndarray:
    n = x.shape[0]
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    xr = x.reshape(n, hw, c)

    out = pl.pallas_call(
        functools.partial(_kernel, num_groups=num_groups, eps=eps, silu=silu,
                          hw=hw, c=c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
    )(xr, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(x.shape)


def _stats_kernel(x_ref, s1_ref, s2_ref, *, c: int, num_groups: int,
                  n_tiles: int):
    """Accumulate per-group sum and sum-of-squares over spatial tiles.

    Grid (N, n_tiles); x block (1, tile, C); outputs (1, 1, G) f32 revisited
    across the tile axis (sequential TPU grid -> safe accumulation)."""
    j = pl.program_id(1)
    x = x_ref[...].astype(jnp.float32).reshape(-1, c)
    s1 = jnp.sum(x, axis=0, keepdims=True)      # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)  # (1, C)
    # Fold channels into groups with a one-hot matmul: mosaic cannot reshape
    # the lane dim into (G, C/G), but (1,C)x(C,G) lowers cleanly to the MXU.
    cpg = c // num_groups
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cpg
    grp_id = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (ch_group == grp_id).astype(jnp.float32)
    g1 = jax.lax.dot_general(s1, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    g2 = jax.lax.dot_general(s2, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[...] += g1.reshape(s1_ref.shape)
    s2_ref[...] += g2.reshape(s2_ref.shape)


def _pick_stats_tile(hw: int, c: int,
                     budget: Optional[int] = None) -> Optional[int]:
    """Largest spatial tile (divisor of hw, multiple of 8 when possible)
    whose fp32 working copy fits the VMEM budget.

    budget=None reads VMEM_BUDGET_BYTES at call time (a def-time default
    would freeze the import-time value and ignore test/runtime overrides)."""
    if budget is None:
        budget = VMEM_BUDGET_BYTES
    max_rows = max(budget // (c * 6), 1)  # bf16 in + f32 copy ~ 6 B/elem
    best = None
    for t in range(1, hw + 1):
        if hw % t == 0 and t <= max_rows:
            if t % 8 == 0 or best is None or best % 8 != 0:
                best = t
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def group_stats_pallas(x: jnp.ndarray, num_groups: int):
    """Per-(sample, group) sum and sum-of-squares of a (N, HW, C) tensor,
    computed in an opaque Pallas kernel. Returns two (N, G) f32 arrays.

    Purpose is as much about what XLA *cannot* do with it as speed: when the
    stats are plain reduces, XLA fuses them into the producing convolution
    (`convert_reduce_fusion`), which drags the conv fusion's effective
    bandwidth to 13-40 GiB/s — 31% of the round-1 sampling step (r2 xprof).
    A custom call cannot be fused, so the conv keeps its clean epilogue and
    the stats read runs at memory speed. The round-1 alternatives (ones-dot,
    optimization_barrier) lost to simplifier rewrites or blocked epilogues
    (see NOTE in _reference_groupnorm).
    """
    n, hw, c = x.shape
    tile = _pick_stats_tile(hw, c)
    assert tile is not None
    g = num_groups
    s1, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, c=c, num_groups=g,
                          n_tiles=hw // tile),
        interpret=_INTERPRET,
        grid=(n, hw // tile),
        in_specs=[
            pl.BlockSpec((None, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, 1, g), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, g), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, g), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, g), jnp.float32),
        ],
    )(x)
    return s1.reshape(n, g), s2.reshape(n, g)


def _stats_fwd(x, num_groups):
    return group_stats_pallas(x, num_groups), (x,)


def _stats_bwd(num_groups, res, grads):
    (x,) = res
    g1, g2 = grads
    n, hw, c = x.shape
    cpg = c // num_groups
    # d s1 / dx = 1, d s2 / dx = 2x  (per group)
    g1c = jnp.repeat(g1, cpg, axis=1)[:, None, :]
    g2c = jnp.repeat(g2, cpg, axis=1)[:, None, :]
    return ((g1c + 2.0 * x.astype(jnp.float32) * g2c).astype(x.dtype),)


group_stats_pallas.defvjp(_stats_fwd, _stats_bwd)


def _reference_groupnorm(x, scale, bias, num_groups, eps, silu):
    """Unfused fp32 path (matches GroupNorm32 semantics).

    Statistics are computed channel-first: reduce over the spatial axis to a
    small (N, C) tensor, then fold channels into groups. The full activation
    tensor is never reshaped to (..., G, C/G) — splitting the channel (lane)
    dimension forces a relayout on TPU, which measurably slows the UNet
    (3.19 -> 3.82 frames/s end-to-end on v5e when avoided).

    See the NOTE below on why the spatial sums stay plain reduces."""
    n = x.shape[0]
    c = x.shape[-1]
    cpg = c // num_groups
    xf = x.astype(jnp.float32).reshape(n, -1, c)
    hw = xf.shape[1]
    # NOTE on the stats reduces: XLA fuses them into the producing conv
    # (convert_reduce_fusion), dragging it from ~160 to ~100-120 TF/s on
    # v5e. Both escape hatches measured worse in the full program despite
    # winning standalone microbenches: (a) dot-with-ones MXU stats matches
    # the pure-conv floor in isolation but hangs the v5e compiler inside the
    # 25-step sampler scan (and is silently rewritten back to a reduce
    # unless the ones vector is barrier-hidden); (b) an optimization_barrier
    # on x detaches the reduce but blocks the conv's other epilogue fusions
    # (5.04 -> 4.90 frames/s e2e). The plain form is the best known.
    from gcd_tpu.ops.attention import _is_tpu_backend

    # The gn_stats_pallas flag is also set PROGRAM-WIDE for pathological
    # batch extents by dispatch.program_flag_overrides (the PERF_BATCH
    # batch-4 layout-pathology mitigation) — see that function's docstring.
    # A site-scoped auto-rule here was tried first and rejected: switching
    # only some GN sites re-shuffles XLA's global layout assignment, which
    # either re-creates the pathological batch-minormost reduce on the
    # remaining sites (N=112-only variant of the 320-ch rule: still 1.06
    # f/s) or produces a program that faults the v5e at run time (all-N=112
    # variant: 3x reproducible device fault). Only the whole-program flip
    # is measured-good.
    from gcd_tpu.ops.dispatch import kernel_enabled

    use_pallas_stats = (
        kernel_enabled("gn_stats_pallas")
        and _is_tpu_backend()
        and c % num_groups == 0
        and _pick_stats_tile(hw, c) is not None
    )
    if use_pallas_stats:
        g1, g2 = group_stats_pallas(x.reshape(n, hw, c), num_groups)
    else:
        s1 = jnp.sum(xf, axis=1)
        s2 = jnp.sum(xf * xf, axis=1)
        g1 = s1.reshape(n, num_groups, cpg).sum(-1)
        g2 = s2.reshape(n, num_groups, cpg).sum(-1)
    cnt = hw * cpg
    mean = g1 / cnt
    var = g2 / cnt - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    mean_c = jnp.repeat(mean, cpg, axis=1)[:, None, :]
    inv_c = jnp.repeat(inv, cpg, axis=1)[:, None, :]
    y = ((xf - mean_c) * (inv_c * scale.astype(jnp.float32))
         + bias.astype(jnp.float32))
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(x.shape).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm(x, scale, bias, num_groups: int = 32, eps: float = 1e-5,
                     silu: bool = False):
    """GroupNorm over the channel-last dim (+optional SiLU), fp32 statistics,
    input-dtype output. x: (N, ..., C)."""
    return _fused_forward(x, scale, bias, num_groups, eps, silu)


def _fwd(x, scale, bias, num_groups, eps, silu):
    out = _fused_forward(x, scale, bias, num_groups, eps, silu)
    return out, (x, scale, bias)


def _bwd(num_groups, eps, silu, res, g):
    x, scale, bias = res

    def ref(x, scale, bias):
        return _reference_groupnorm(x, scale, bias, num_groups, eps, silu)

    _, vjp = jax.vjp(ref, x, scale, bias)
    return vjp(g)


fused_group_norm.defvjp(_fwd, _bwd)


def group_norm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    num_groups: int = 32, eps: float = 1e-5,
                    silu: bool = False) -> jnp.ndarray:
    """GroupNorm(+SiLU) entry point used by the models.

    Benchmarked on TPU v5e at SVD-UNet shapes: the Pallas kernel is correct
    but *slower* end-to-end than letting XLA fuse the unfused fp32 chain
    (199 ms vs 179 ms per CFG forward, bytes-accessed 86.7 GB vs 82.0 GB) —
    pallas_call is an opaque boundary that blocks XLA from fusing the
    neighboring elementwise ops into the norm. The XLA path is therefore the
    default; set GCD_FUSED_GN=1 to re-enable the kernel (e.g. to re-evaluate
    on newer compilers/hardware)."""
    from gcd_tpu.ops.attention import _is_tpu_backend
    from gcd_tpu.ops.dispatch import kernel_enabled

    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    block_bytes = hw * c * (x.dtype.itemsize + 4)  # input + f32 working copy
    if (
        kernel_enabled("fused_gn")
        and _is_tpu_backend()
        and c % num_groups == 0
        and block_bytes <= VMEM_BUDGET_BYTES
    ):
        try:
            return fused_group_norm(x, scale, bias, num_groups, eps, silu)
        except Exception:
            pass
    return _reference_groupnorm(x, scale, bias, num_groups, eps, silu)
