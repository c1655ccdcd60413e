"""Pallas TPU flash attention.

Replaces the reference's xformers memory-efficient attention / torch SDPA
(gcd-model/sgm/modules/attention.py:332-336, 427-439) with a fused
online-softmax kernel tuned for GCD's shapes: many (batch x head) rows of
short-to-medium sequences (spatial tokens <= 1536, head_dim 64).

Design notes (per the Pallas TPU guide):
  * grid = (batch*heads, num_q_blocks); the full K/V for one row rides in VMEM
    (<= 1536 x 64 x 2 dtypes — well under the VMEM budget), so no k-loop DMA
    pipelining is needed at these sizes; the kernel loops over K blocks with a
    fori_loop carrying the running max / normalizer (classic flash recurrence).
  * logits accumulate in fp32 on the MXU (`preferred_element_type`); inputs may
    be bf16.
  * sequence lengths are padded to the block size with -inf masking on K.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                  block_k: int):
    # q_ref: (BQ, D); k_ref/v_ref: (S_pad, D); o_ref: (BQ, D)
    q = q_ref[:].astype(jnp.float32) * scale
    bq, d = q.shape
    s_pad = k_ref.shape[0]
    num_kb = s_pad // block_k

    m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, d), dtype=jnp.float32)

    def body(ib, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(ib * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(ib * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        # Mask out positions beyond the true kv length (padding).
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + ib * block_k
        logits = jnp.where(col < kv_len, logits, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, Sq, H, D) attention with fused online softmax. Returns (B, Sq, H, D)."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = float(d**-0.5 if scale is None else scale)

    block_q = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (skv - 1).bit_length()))

    # (B, S, H, D) -> (B*H, S, D)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)

    qf = _pad_to(qf, 1, block_q)
    kf = _pad_to(kf, 1, block_k)
    vf = _pad_to(vf, 1, block_k)
    sq_pad = qf.shape[1]
    skv_pad = kf.shape[1]

    grid = (b * h, sq_pad // block_q)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=skv, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_pad, d), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_pad, d), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :sq]
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
