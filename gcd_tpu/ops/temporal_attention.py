"""Pallas TPU temporal attention in the natural token layout.

The temporal transformer attends over the T frames at every spatial location
(reference: gcd-model/sgm/modules/video_attention.py:15-140, which rearranges
the whole tensor to (B*S, T, C) around every block). On TPU the rearrange is
the cost: each (B*T, S, C) <-> (B*S, T, H, D) transpose is a full-tensor HBM
relayout, and the q/k/v/out set of them dominated temporal-attention wall time
(xprof: ~10 ms/step of `data formatting` copies in the 14-frame UNet step).

This kernel consumes q/k/v exactly as the projections produce them —
(B*T, S, C) — and emits the output in the same layout, so the surrounding
XLA program contains no transposes at all. Inside the kernel:

  * grid = (video, spatial_block); each step holds the (T, bs, C) slab of one
    video in VMEM.
  * spatial positions are processed in packs of 8 (one sublane tile). The
    (T, 8, D) head-slab reshapes to (T*8, D) for free — the 8-wide sublane
    tile is the memory layout — giving a dense (T*8, T*8, D) MXU matmul per
    pack instead of T-by-T matmuls batched over positions (which Mosaic
    unrolls into thousands of ~14x14x64 passes at ~1% MXU utilization).
  * rows are t-major within a pack, so frame t of position s attends frame t'
    of the same position via a striped mask: row i sees col j iff i == j
    (mod 8). Masked logits get -1e30 before an otherwise ordinary exact
    softmax (fp32, max-subtracted), which therefore matches the reference's
    per-position softmax bit-for-bit over the valid entries.

Backward runs the plain XLA transpose+einsum formulation via custom_vjp
recompute: the training step pays the relayouts, inference never does.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# One sublane tile of spatial positions shares each packed matmul.
_PACK = 8


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, d: int,
            t: int, scale: float, pack2: bool = False):
    """Pack-outer loop: one (T*8, C) slab per pack, per-head lane slices on
    the 2D slab, heads re-concatenated so every o_ref store is a full-lane
    (T, 8, C) write (no read-modify-write lane masking). Measured faster than
    a head-outer loop with per-head strided stores (5.02 vs 4.98 f/s e2e).

    pack2: the flash-kernel head-pair packing (ops/flash_attention.py
    _mh_kernel) applied to the per-pack matmuls — block-diagonal zero-packed
    K/V turn two 64-deep contractions into one 128-deep one; odd head counts
    (C=320 -> 5) run the leftover head at natural depth."""
    bs = q_ref.shape[1]
    c = q_ref.shape[2]
    packs = bs // _PACK
    rows = t * _PACK
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    mask = (row % _PACK) == (col % _PACK)

    def one_head(qg, kg, vg, hs):
        lg = jax.lax.dot_general(
            qg[:, hs], kg[:, hs], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        lg = jnp.where(mask, lg, NEG_INF)
        m = jnp.max(lg, -1, keepdims=True)
        p = jnp.exp(lg - m)
        denom = jnp.sum(p, -1, keepdims=True)
        return jax.lax.dot_general(
            p.astype(vg.dtype), vg[:, hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom

    def head_pair(qg, kg, vg, hp):
        c0 = 2 * hp * d
        q2 = qg[:, c0:c0 + 2 * d]  # (R, 2D); adjacent heads contiguous
        kh1, kh2 = kg[:, c0:c0 + d], kg[:, c0 + d:c0 + 2 * d]
        vh1, vh2 = vg[:, c0:c0 + d], vg[:, c0 + d:c0 + 2 * d]
        zero = jnp.zeros_like(kh1)
        k2 = jnp.concatenate(
            [jnp.concatenate([kh1, zero], axis=-1),
             jnp.concatenate([zero, kh2], axis=-1)], axis=0)  # (2R, 2D)
        v2 = jnp.concatenate(
            [jnp.concatenate([vh1, zero], axis=-1),
             jnp.concatenate([zero, vh2], axis=-1)], axis=0)
        lg = jax.lax.dot_general(
            q2, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (R, 2R)=[L1|L2]
        l1 = jnp.where(mask, lg[:, :rows], NEG_INF)
        l2 = jnp.where(mask, lg[:, rows:], NEG_INF)
        m1 = jnp.max(l1, -1, keepdims=True)
        p1 = jnp.exp(l1 - m1)
        den1 = jnp.sum(p1, -1, keepdims=True)
        m2 = jnp.max(l2, -1, keepdims=True)
        p2 = jnp.exp(l2 - m2)
        den2 = jnp.sum(p2, -1, keepdims=True)
        o2 = jax.lax.dot_general(
            jnp.concatenate([p1, p2], axis=-1).astype(v2.dtype), v2,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (R, 2D) = [o1|o2]
        return jnp.concatenate([o2[:, :d] / den1, o2[:, d:] / den2], axis=-1)

    for g in range(packs):
        sl = slice(g * _PACK, (g + 1) * _PACK)
        qg = q_ref[:, sl, :].reshape(rows, c)
        kg = k_ref[:, sl, :].reshape(rows, c)
        vg = v_ref[:, sl, :].reshape(rows, c)
        outs = []
        if pack2 and heads >= 2 and 2 * d <= 128:
            for hp in range(heads // 2):
                outs.append(head_pair(qg, kg, vg, hp))
            if heads % 2:
                outs.append(one_head(qg, kg, vg,
                                     slice((heads - 1) * d, heads * d)))
        else:
            for h in range(heads):
                outs.append(one_head(qg, kg, vg,
                                     slice(h * d, (h + 1) * d)))
        og = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
        o_ref[:, sl, :] = og.reshape(t, _PACK, c)


def _pick_block_s(s: int, t: int, c: int, itemsize: int) -> Optional[int]:
    """Largest spatial block that divides s and keeps the 4 slabs + per-pack
    temporaries comfortably inside scoped VMEM."""
    for bs in (128, 64, 32, 16, 8):
        if s % bs:
            continue
        slab = t * bs * c * itemsize
        if 4 * slab <= 8 * 1024 * 1024:
            return bs
    return None


def _supported(q3, t: int, heads: int) -> bool:
    bt, s, c = q3.shape
    if bt % t or c % heads:
        return False
    d = c // heads
    if d % 64 or s % _PACK:
        return False
    return _pick_block_s(s, t, c, q3.dtype.itemsize) is not None


def _pallas_fwd(q3, k3, v3, t: int, heads: int, scale: float):
    bt, s, c = q3.shape
    b = bt // t
    d = c // heads
    from gcd_tpu.ops.dispatch import kernel_enabled

    bs = _pick_block_s(s, t, c, q3.dtype.itemsize)
    spec = pl.BlockSpec((t, bs, c), lambda bi, si: (bi, si, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, d=d, t=t, scale=scale,
                          pack2=kernel_enabled("tattn_pack2")),
        grid=(b, s // bs),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bt, s, c), q3.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(q3, k3, v3)


def _xla_temporal(q3, k3, v3, t: int, heads: int, scale: float):
    """Reference formulation: relayout to (B*S, T, H, D), einsum attention,
    relayout back. Used off-TPU and as the backward recompute."""
    bt, s, c = q3.shape
    b = bt // t
    d = c // heads

    def tm(z):
        return z.reshape(b, t, s, heads, d).transpose(0, 2, 1, 3, 4)

    qh, kh, vh = tm(q3), tm(k3), tm(v3)  # (B, S, T, H, D)
    logits = jnp.einsum("bsqhd,bskhd->bshqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bshqk,bskhd->bsqhd", w.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32).astype(q3.dtype)
    return out.transpose(0, 2, 1, 3, 4).reshape(bt, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _temporal(q3, k3, v3, t: int, heads: int, scale: float):
    return _pallas_fwd(q3, k3, v3, t, heads, scale)


def _temporal_fwd(q3, k3, v3, t, heads, scale):
    return _pallas_fwd(q3, k3, v3, t, heads, scale), (q3, k3, v3)


def _temporal_bwd(t, heads, scale, res, g):
    q3, k3, v3 = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_temporal(q, k, v, t, heads, scale),
                     q3, k3, v3)
    return vjp(g)


_temporal.defvjp(_temporal_fwd, _temporal_bwd)


def temporal_attention(
    q3: jnp.ndarray,
    k3: jnp.ndarray,
    v3: jnp.ndarray,
    timesteps: int,
    heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Frame-axis self-attention on (B*T, S, H*D) tokens, output same layout.

    Every spatial position s of video b attends over its T frames — the math
    of video_attention.py:114's rearranged attention — without any HBM
    relayout on TPU (see module docstring). Falls back to the XLA
    formulation when the Pallas kernel does not support the shape or the
    backend is not a TPU.
    """
    from gcd_tpu.ops.attention import _is_tpu_backend
    from gcd_tpu.ops.dispatch import kernel_enabled

    c = q3.shape[-1]
    d = c // heads
    scale = float(d ** -0.5 if scale is None else scale)

    if (_is_tpu_backend() and _supported(q3, timesteps, heads)
            and kernel_enabled("tattn_pallas")):
        try:
            return _temporal(q3, k3, v3, timesteps, heads, scale)
        except Exception:
            pass
    return _xla_temporal(q3, k3, v3, timesteps, heads, scale)
