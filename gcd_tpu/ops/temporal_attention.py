"""Fused temporal self-attention in the natural (B*T, S, H*D) token layout.

The reference reshapes tokens to (B*S, T, C) and runs standard attention over
the T=14 frames (gcd-model/sgm/modules/video_attention.py:114). On TPU that
reshape is a physical relayout: XLA materializes (b, s, t, h, d) transposes of
q/k/v/out — ~0.5 ms of HBM copies per temporal layer at ds1 — and the
projected q/k/v tensors themselves round-trip HBM (3 x 27.5 MB at ds1).

This kernel fuses the whole block: x -> {q,k,v} projections -> frame-to-frame
attention -> output projection, never leaving VMEM. A grid over
(video, spatial tile) fetches (T, TS, C) blocks — T consecutive rows of the
natural layout, no transpose — and computes attention per spatial column on
the VPU:

    logits[u, v, s] = sum_d q[u, s, d] * k[v, s, d]

T is tiny (14), so the t^2 unrolled multiply+lane-reduce loop beats both the
MXU's batched (14x64)@(64x14) matmuls and, decisively, the HBM relayouts it
replaces. Softmax in f32.

Backward: custom_vjp recomputing through the XLA reference implementation
(same pattern as ops/flash_attention.py).

STATUS (parked, auto-fallback active): the remote Mosaic compile helper on
this runtime crashes (HTTP 500, subprocess exit 1, no diagnostics) on the
full T=14 unrolled kernel; bisection shows the 2D formulation compiles up to
u<=8 unrolled frame rows and dies at 14, independent of formulation (3D
stacks fail too), i.e. a kernel-size limit in the helper rather than an
unsupported op. Spreading u over a third grid dimension would multiply QKV
projection work; a two-kernel split reintroduces the HBM round trips this
exists to remove. Also measured: restructuring VideoTransformerBlock to
t-major-once (the reference layout) regresses end-to-end 4.53 -> 4.37 f/s
because XLA inserts relayouts around the fused-MLP custom-call boundary.
Revisit when the compile helper handles larger kernels.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_core(q, k, v, t: int, heads: int, d: int, scale: float):
    """(T, TS, H*D) q/k/v -> (T, TS, H*D); unrolled VPU attention over T."""
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, :, sl].astype(jnp.float32) * scale  # (T, TS, D)
        kh = k[:, :, sl].astype(jnp.float32)
        vh = v[:, :, sl].astype(jnp.float32)
        logits = jnp.stack(
            [jnp.sum(qh[u][None, :, :] * kh, axis=-1) for u in range(t)]
        )  # (T_u, T_v, TS)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        out_h = jnp.stack(
            [jnp.sum(p[u][:, :, None] * vh, axis=0) for u in range(t)]
        )  # (T_u, TS, D)
        outs.append(out_h)
    return jnp.concatenate(outs, axis=-1)


def _kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref, *,
            heads: int, d: int, t: int, scale: float):
    ts = x_ref.shape[1]
    c = x_ref.shape[2]
    hd = heads * d
    x2 = x_ref[...].reshape(t * ts, c)
    q = jnp.dot(x2, wq_ref[...], preferred_element_type=jnp.float32).astype(
        x2.dtype).reshape(t, ts, hd)
    k = jnp.dot(x2, wk_ref[...], preferred_element_type=jnp.float32).astype(
        x2.dtype).reshape(t, ts, hd)
    v = jnp.dot(x2, wv_ref[...], preferred_element_type=jnp.float32).astype(
        x2.dtype).reshape(t, ts, hd)
    out = _attn_core(q, k, v, t, heads, d, scale).astype(x2.dtype)
    o = jnp.dot(out.reshape(t * ts, hd), wo_ref[...],
                preferred_element_type=jnp.float32)
    o = o + bo_ref[...].astype(jnp.float32)
    o_ref[...] = o.reshape(t, ts, -1).astype(o_ref.dtype)


def _xla_temporal(x, wq, wk, wv, wo, bo, t: int, heads: int, scale: float):
    """Reference path (backward recompute / fallback): project, transpose to
    (B*S, T, H, D), standard attention, project back."""
    from gcd_tpu.ops.attention import _xla_attention

    bt, s, c = x.shape
    b = bt // t
    hd = wq.shape[1]
    d = hd // heads
    q = jnp.dot(x, wq.astype(x.dtype))
    k = jnp.dot(x, wk.astype(x.dtype))
    v = jnp.dot(x, wv.astype(x.dtype))

    def tmaj(z):
        z = z.reshape(b, t, s, heads, d)
        return z.transpose(0, 2, 1, 3, 4).reshape(b * s, t, heads, d)

    out = _xla_attention(tmaj(q), tmaj(k), tmaj(v), scale=scale)
    out = out.reshape(b, s, t, hd).transpose(0, 2, 1, 3).reshape(bt, s, hd)
    return jnp.dot(out, wo.astype(x.dtype)) + bo.astype(x.dtype)


def _pick_tile(s: int, c: int, hd: int, t: int) -> Optional[int]:
    for ts in (256, 192, 128, 96, 64):
        if s % ts:
            continue
        # x/out blocks double-buffered + bf16 q/k/v temps + f32 head temps.
        vmem = (
            2 * 2 * t * ts * max(c, hd) * 2      # x + out, double-buffered
            + 3 * t * ts * hd * 2                # q/k/v temps
            + 4 * t * ts * 64 * 4                # f32 per-head working set
            + 3 * t * t * ts * 4                 # logit stack
            + (3 * c * hd + hd * c) * 2          # weight tiles
        )
        if vmem <= 12 * 1024 * 1024:
            return ts
    return None


def _fused_forward(x, wq, wk, wv, wo, bo, t, heads, scale, ts):
    bt, s, c = x.shape
    b = bt // t
    hd = wq.shape[1]
    d = hd // heads
    c_out = wo.shape[1]
    grid = (b, s // ts)
    blk = lambda ch: pl.BlockSpec((t, ts, ch), lambda bi, si: (bi, si, 0),
                                  memory_space=pltpu.VMEM)
    wspec = lambda a, bdim: pl.BlockSpec((a, bdim), lambda bi, si: (0, 0),
                                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, d=d, t=t, scale=scale),
        grid=grid,
        in_specs=[
            blk(c),
            wspec(c, hd), wspec(c, hd), wspec(c, hd),
            wspec(hd, c_out),
            pl.BlockSpec((1, c_out), lambda bi, si: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=blk(c_out),
        out_shape=jax.ShapeDtypeStruct((bt, s, c_out), x.dtype),
    )(x, wq, wk, wv, wo, bo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _temporal_block(x, wq, wk, wv, wo, bo, t: int, heads: int, scale: float):
    hd = wq.shape[1]
    ts = _pick_tile(x.shape[1], x.shape[2], hd, t)
    backend = jax.default_backend()
    if ts is None or backend not in ("tpu", "axon"):
        return _xla_temporal(x, wq, wk, wv, wo, bo, t, heads, scale)
    try:
        return _fused_forward(x, wq.astype(x.dtype), wk.astype(x.dtype),
                              wv.astype(x.dtype), wo.astype(x.dtype),
                              bo.reshape(1, -1), t, heads, scale, ts)
    except Exception as e:
        import warnings

        warnings.warn(f"pallas temporal attention failed, using XLA: {e!r}")
        return _xla_temporal(x, wq, wk, wv, wo, bo, t, heads, scale)


def _fwd(x, wq, wk, wv, wo, bo, t, heads, scale):
    return _temporal_block(x, wq, wk, wv, wo, bo, t, heads, scale), (
        x, wq, wk, wv, wo, bo)


def _bwd(t, heads, scale, res, g):
    x, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: _xla_temporal(*a, t, heads, scale), x, wq, wk, wv, wo, bo)
    return vjp(g.astype(x.dtype))


_temporal_block.defvjp(_fwd, _bwd)


def temporal_self_attention_block(
    x: jnp.ndarray, wq: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray,
    wo: jnp.ndarray, bo: jnp.ndarray, timesteps: int, heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Full temporal self-attention block on natural-layout (B*T, S, C)
    tokens: qkv projection (no bias, attention.py:262-264) -> attention over
    the T frames -> output projection (with bias). Rows of one video must be
    consecutive ((b t) flattening — kubric_arbit.py:650)."""
    hd = wq.shape[1]
    d = hd // heads
    scale = float(d**-0.5 if scale is None else scale)
    return _temporal_block(x, wq, wk, wv, wo, bo, timesteps, heads, scale)
