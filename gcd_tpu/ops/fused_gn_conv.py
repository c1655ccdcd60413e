"""Fused GroupNorm -> SiLU -> Conv3x3 Pallas kernel.

The SVD UNet's ResBlocks spend most of their time in GN+SiLU+conv chains.
XLA either fuses the GN statistics reduce into the producing convolution
(dragging it from ~160 to ~100-120 TF/s on v5e, see ops/fused_norm.py) or
pays extra HBM passes. This kernel owns the whole chain:

  * grid = (F-blocks, N): one full sample's activation map per step (at UNet
    latent resolutions a sample is <= ~1 MB, so halo handling is a non-issue
    — the 3x3 conv sees the entire padded plane in VMEM). F-blocks iterate
    in the outer grid dim so the weight slab stays VMEM-resident across the
    N inner steps.
  * GN statistics are computed in-kernel from the VMEM copy (sum/sum2 over
    the (H*W, C) view, group-folded via a one-hot matmul — Mosaic cannot
    split the lane dim, ops/fused_norm.py:38-47), so the producing conv in
    the previous layer stays pure and no fp32 activation copy ever reaches
    HBM.
  * The convolution is 9 shifted (H*W, C) @ (C, F) MXU matmuls over the
    zero-padded normalized plane with fp32 accumulation — dense in C and F,
    no im2col materialization.

Replaces the reference's cuDNN conv + fp32 GroupNorm pair
(gcd-model/sgm/modules/diffusionmodules/openaimodel.py:213-357,
util.py:274). Backward: custom_vjp recompute of the plain XLA chain.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-invocation VMEM ceiling: sample plane + padded fp32 copy + weight slab.
VMEM_BUDGET_BYTES = 96 * 1024 * 1024
_MAX_FBLOCK = 512


def _kernel(xl_ref, xc_ref, xr_ref, scale_ref, bias_ref, w_ref, b_ref,
            o_ref, *, groups: int, eps: float, h: int, w: int, c: int,
            silu: bool):
    """xl/xc/xr are the dx = -1/0/+1 shifted copies of the input plane,
    prepared by XLA outside the kernel (zero column at the entering border).
    Mosaic-side shifting is a dead end in this toolchain: misaligned slices
    of a padded plane compile at ~20 s/site, and both 2D and 3D
    tpu.(dynamic_)rotate crash the remote Mosaic compiler."""
    hw = h * w

    # --- GroupNorm stats from the center plane (ops/fused_norm.py pattern) ---
    xc = xc_ref[0].astype(jnp.float32).reshape(hw, c)
    s1 = jnp.sum(xc, axis=0, keepdims=True)
    s2 = jnp.sum(xc * xc, axis=0, keepdims=True)
    cpg = c // groups
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cpg
    grp_id = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (ch_group == grp_id).astype(jnp.float32)
    g1 = jax.lax.dot_general(s1, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    g2 = jax.lax.dot_general(s2, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    cnt = float(hw * cpg)
    mean = g1 / cnt
    var = g2 / cnt - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    mean_c = jax.lax.dot_general(mean, onehot, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv, onehot, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    gamma = scale_ref[...].astype(jnp.float32)
    beta = bias_ref[...].astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % w

    def norm(ref, border):
        z = ref[0].astype(jnp.float32).reshape(hw, c)
        z = (z - mean_c) * (inv_c * gamma) + beta
        if silu:
            z = z * jax.nn.sigmoid(z)
        if border is not None:
            # The shifted copies carry a zero column where the window leaves
            # the plane; conv semantics need a zero *after* normalization.
            z = jnp.where(col == border, 0.0, z)
        return z.astype(xc_ref.dtype)

    planes = [norm(xl_ref, 0), norm(xc_ref, None), norm(xr_ref, w - 1)]

    # --- 3x3 conv: dy taps are free slices along the untiled H dim ---
    f = w_ref.shape[-1]
    acc = jnp.zeros((hw, f), jnp.float32)
    for dx in range(3):
        yp = jnp.pad(planes[dx].reshape(h, w, c), ((1, 1), (0, 0), (0, 0)))
        for dy in range(3):
            ys = yp[dy:dy + h].reshape(hw, c)
            acc += jax.lax.dot_general(
                ys, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc += b_ref[...].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype).reshape(h, w, f)


def _fused_forward(x, scale, bias, wk, bk, groups, eps, silu, f_block):
    n, h, w, c = x.shape
    f = wk.shape[-1]
    # dx-shifted copies with a zero entering column, built by XLA (cheap
    # fused pad+slice copies; ~2 extra plane reads per call).
    xl = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :w, :]
    xr = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    grid = (f // f_block, n)
    plane = pl.BlockSpec((1, h, w, c), lambda fi, ni: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda fi, ni: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, h=h, w=w, c=c,
                          silu=silu),
        grid=grid,
        in_specs=[
            plane, plane, plane, vec, vec,
            pl.BlockSpec((3, 3, c, f_block), lambda fi, ni: (0, 0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_block), lambda fi, ni: (0, fi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, f_block),
                               lambda fi, ni: (ni, 0, 0, fi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, f), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES),
    )(xl, x, xr, scale.reshape(1, c), bias.reshape(1, c), wk,
      bk.reshape(1, f))
    return out


def _xla_chain(x, scale, bias, wk, bk, groups, eps, silu):
    """Reference/backward path: the plain GN(+SiLU)+conv chain."""
    from gcd_tpu.ops.fused_norm import _reference_groupnorm

    y = _reference_groupnorm(x, scale, bias, groups, eps, silu)
    out = jax.lax.conv_general_dilated(
        y, wk.astype(y.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (out + bk.astype(jnp.float32)).astype(x.dtype)


def _pick_f_block(h, w, c, f, itemsize):
    """Largest F block (divides f, multiple of 64 lanes) whose weight slab
    plus activation working set fits the budget."""
    plane = h * w * c * (itemsize + 4 + 1)  # in + fp32 working + padded copy

    def fits(fb):
        wslab = 9 * c * fb * itemsize
        outb = h * w * fb * (4 + itemsize)
        return plane + 2 * wslab + outb <= VMEM_BUDGET_BYTES

    # Mosaic requires the minor block dim to be a multiple of 128 or the full
    # array dim, so fb is either f itself or a 128-multiple divisor of f.
    if fits(f):
        return f
    for div in (2, 4, 5, 8, 10):
        if f % div:
            continue
        fb = f // div
        if fb % 128 == 0 and fits(fb):
            return fb
    return None


def supported(x, wk, groups: int) -> bool:
    if x.ndim != 4 or wk.shape[:2] != (3, 3):
        return False
    n, h, w, c = x.shape
    f = wk.shape[-1]
    if c % groups or c % 64 or f % 64:
        return False
    return _pick_f_block(h, w, c, f, x.dtype.itemsize) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(x, scale, bias, wk, bk, groups, eps, silu):
    f_block = _pick_f_block(*x.shape[1:], wk.shape[-1], x.dtype.itemsize)
    return _fused_forward(x, scale, bias, wk, bk, groups, eps, silu, f_block)


def _fwd(x, scale, bias, wk, bk, groups, eps, silu):
    return _fused(x, scale, bias, wk, bk, groups, eps, silu), (
        x, scale, bias, wk, bk)


def _bwd(groups, eps, silu, res, g):
    x, scale, bias, wk, bk = res
    _, vjp = jax.vjp(
        lambda *a: _xla_chain(*a, groups, eps, silu), x, scale, bias, wk, bk)
    return vjp(g.astype(x.dtype))


_fused.defvjp(_fwd, _bwd)


def gn_silu_conv3x3(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = True,
) -> jnp.ndarray:
    """GroupNorm(groups, eps) -> optional SiLU -> 3x3 same-pad conv.

    x: (N, H, W, C) activations; scale/bias: (C,) GN affine; wk: (3, 3, C, F)
    HWIO conv weights; bk: (F,). Fp32 statistics and accumulation, output in
    x.dtype — semantics identical to GroupNorm32 + nn.Conv. Dispatches to the
    fused Pallas kernel on TPU, the plain XLA chain elsewhere.
    """
    from gcd_tpu.ops.attention import _is_tpu_backend

    if _is_tpu_backend() and supported(x, wk, groups):
        try:
            return _fused(x, scale, bias, wk, bk, groups, eps, silu)
        except Exception:
            pass
    return _xla_chain(x, scale, bias, wk, bk, groups, eps, silu)


# ---------------------------------------------------------------------------
# flax param holders replicating GroupNorm32 / nn.Conv param trees exactly,
# so models can route existing checkpoints through the fused op without any
# key remapping (paths: <name>/norm/{scale,bias} and <name>/{kernel,bias}).
# ---------------------------------------------------------------------------

from flax import linen as nn  # noqa: E402


class GN32Params(nn.Module):
    """Same param tree as models.layers.GroupNorm32: <name>/norm/{scale,bias}."""

    features: int

    @nn.compact
    def __call__(self):
        from gcd_tpu.models.layers import _NormParams

        return _NormParams(self.features, name="norm")()


class Conv3x3Params(nn.Module):
    """Same param tree as nn.Conv(features, (3,3)): <name>/{kernel,bias}."""

    features: int
    in_features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init,
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias
