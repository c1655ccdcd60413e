"""Spatial transformer stack (reference: gcd-model/sgm/modules/attention.py).

CrossAttention (:255) / BasicTransformerBlock (:456) / SpatialTransformer (:619),
with the xformers/SDPA kernels replaced by `gcd_tpu.ops.dot_product_attention`
(XLA-fused einsum or Pallas flash kernel on TPU).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcd_tpu.models.layers import FeedForward, GroupNorm32, LayerNormFp32
from gcd_tpu.ops.attention import dot_product_attention

Dtype = Any


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when `context` is None.

    q: (B, S, C); context: (B, Sk, Ck). Projections have no bias except the
    output projection (attention.py:272-279).
    """

    heads: int = 8
    dim_head: int = 64
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        query_dim = x.shape[-1]
        inner = self.heads * self.dim_head
        ctx = x if context is None else context

        to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        to_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = nn.Dense(query_dim, dtype=self.dtype, name="to_out_0")

        if context is not None and context.shape[1] == 1:
            # Exact shortcut for single-token cross-attention (SVD's CLIP
            # image context is (B, 1, 1024)): softmax over one key is
            # identically 1, so the output is to_out(to_v(ctx)) — the same
            # vector for every query token; q/k projections and the attention
            # itself are dead compute. Params for to_q/to_k are still
            # registered on a 1-token slice so checkpoints load identically;
            # XLA removes the unused matmuls.
            #
            # Returns (B, 1, C), NOT materialized to (B, S, C): the residual
            # add broadcasts it for free, and an explicit broadcast_to here
            # was observed to push XLA into batch-in-lanes layouts for the
            # surrounding matmuls (20x slowdown on the ds1 proj_out).
            _ = to_q(x[:, :1])
            _ = to_k(ctx)
            return to_out(to_v(ctx))  # (B, 1, query_dim)

        q = to_q(x)
        k = to_k(ctx)
        v = to_v(ctx)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)

        out = dot_product_attention(q, k, v)
        out = out.reshape(b, sq, inner)
        return to_out(out)


class TemporalSelfAttention(nn.Module):
    """Self-attention over the T frames of (B*T, S, C) tokens, kept in the
    natural layout end-to-end: projections and the output matmul run on
    (B*T, S, C) (layout-friendly on TPU), and the attention core is the
    transpose-free Pallas kernel in ops/temporal_attention.py. Equivalent to
    the reference's rearrange-everything approach (video_attention.py:114),
    which on TPU costs a full-tensor HBM relayout per q/k/v/out — and running
    LayerNorms/FFs/projections on a transposed tensor measurably drops them
    from ~160 to ~42 TFLOP/s on v5e.

    Parameter names match CrossAttention so converted checkpoints are
    indistinguishable.
    """

    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: int) -> jnp.ndarray:
        query_dim = x.shape[-1]
        inner = self.heads * self.dim_head
        t = timesteps

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)

        from gcd_tpu.ops.temporal_attention import temporal_attention

        out = temporal_attention(q, k, v, timesteps=t, heads=self.heads)
        return nn.Dense(query_dim, dtype=self.dtype, name="to_out_0")(out)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> FF, each with pre-LN and residual."""

    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    gated_ff: bool = True
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        h = LayerNormFp32(name="norm1")(x)
        h = CrossAttention(
            heads=self.n_heads,
            dim_head=self.d_head,
            context_dim=self.context_dim if self.disable_self_attn else None,
            dtype=self.dtype,
            name="attn1",
        )(h, context=context if self.disable_self_attn else None)
        x = h + x

        h = LayerNormFp32(name="norm2")(x)
        h = CrossAttention(
            heads=self.n_heads,
            dim_head=self.d_head,
            context_dim=self.context_dim,
            dtype=self.dtype,
            name="attn2",
        )(h, context=context)
        x = h + x

        h = LayerNormFp32(name="norm3")(x)
        h = FeedForward(glu=self.gated_ff, dtype=self.dtype, name="ff")(h)
        return h + x


class SpatialTransformer(nn.Module):
    """GroupNorm + (linear|1x1-conv) proj-in, N transformer blocks, zero-init
    proj-out, residual (attention.py:619-725). Input (N, H, W, C)."""

    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_linear: bool = False
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        n, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x

        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        if not self.use_linear:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(n, h * w, x.shape[-1])
        if self.use_linear:
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)

        for d in range(self.depth):
            x = BasicTransformerBlock(
                n_heads=self.n_heads,
                d_head=self.d_head,
                context_dim=self.context_dim,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype,
                name=f"transformer_blocks_{d}",
            )(x, context=context)

        if self.use_linear:
            x = nn.Dense(
                c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="proj_out",
            )(x)
        x = x.reshape(n, h, w, x.shape[-1])
        if not self.use_linear:
            x = nn.Conv(
                c, (1, 1), kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="proj_out",
            )(x)
        return x + x_in
