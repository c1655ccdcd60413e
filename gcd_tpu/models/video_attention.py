"""Temporal transformer stack (reference: gcd-model/sgm/modules/video_attention.py).

VideoTransformerBlock (:15) runs attention over the T frames at each spatial
location by viewing tokens as (B*S, T, C); SpatialVideoTransformer (:146) pairs
each spatial BasicTransformerBlock with a temporal block plus a learned
frame-position embedding and AlphaBlender merge.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from gcd_tpu.models.attention import (
    BasicTransformerBlock,
    CrossAttention,
    TemporalSelfAttention,
)
from gcd_tpu.models.layers import (
    AlphaBlender,
    FeedForward,
    GroupNorm32,
    LayerNormFp32,
)
from gcd_tpu.ops.basic import timestep_embedding

Dtype = Any


class VideoTransformerBlock(nn.Module):
    """Temporal transformer block (video_attention.py:15-140).

    TPU-native layout: tokens stay (B*T, S, C) — the natural layout produced
    by the spatial stack — throughout the block. LayerNorms, FeedForwards and
    attention projections are per-token ops, so they are layout-indifferent
    mathematically but far faster in the natural layout; only the temporal
    self-attention core transposes its q/k/v heads (TemporalSelfAttention).
    Temporal *cross*-attention never mixes frames (every query attends to the
    same per-video context keys), so it runs on a free (B, T*S, C) view.

    `context`, when given, is the per-video context (B, L, Ck) — NOT repeated
    over spatial positions as in the reference (video_attention.py:250-257);
    the repeat is a mathematical no-op here because keys are shared.
    """

    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    gated_ff: bool = True
    ff_in: bool = False
    disable_self_attn: bool = False
    disable_temporal_crossattention: bool = False
    switch_temporal_ca_to_sa: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        timesteps: Optional[int] = None,
    ) -> jnp.ndarray:
        t = timesteps
        bt, s, c = x.shape
        b = bt // t

        def cross_to_context(h, name):
            if context is None:
                # attn_cls with context=None self-attends over the (b s) t c
                # layout (video_attention.py:84-90,128-131) — i.e. temporal
                # self-attention per pixel. Used by the VAE VideoBlock, whose
                # time_mix_block gets no context (temporal_ae.py:160-161).
                return TemporalSelfAttention(
                    heads=self.n_heads, dim_head=self.d_head, dtype=self.dtype,
                    name=name,
                )(h, timesteps=t)
            # (B*T, S, C) -> (B, T*S, C) is a free reshape; context keys are
            # per-video so this is exactly the reference's per-pixel temporal
            # cross-attention.
            hv = h.reshape(b, t * s, c)
            out = CrossAttention(
                heads=self.n_heads, dim_head=self.d_head,
                context_dim=self.context_dim, dtype=self.dtype, name=name,
            )(hv, context=context)
            if out.shape[1] == 1:
                # Single-key shortcut returned one token per video; replicate
                # per frame (tiny) and let the residual add broadcast over S.
                return jnp.repeat(out, t, axis=0)  # (B*T, 1, C)
            return out.reshape(bt, s, out.shape[-1])

        if self.ff_in:
            x_skip = x
            h = LayerNormFp32(name="norm_in")(x)
            x = FeedForward(glu=self.gated_ff, dtype=self.dtype, name="ff_in")(h) + x_skip

        h = LayerNormFp32(name="norm1")(x)
        if self.disable_self_attn:
            h = cross_to_context(h, "attn1")
        else:
            h = TemporalSelfAttention(
                heads=self.n_heads, dim_head=self.d_head, dtype=self.dtype,
                name="attn1",
            )(h, timesteps=t)
        x = h + x

        if not self.disable_temporal_crossattention:
            h = LayerNormFp32(name="norm2")(x)
            if self.switch_temporal_ca_to_sa:
                h = TemporalSelfAttention(
                    heads=self.n_heads, dim_head=self.d_head, dtype=self.dtype,
                    name="attn2",
                )(h, timesteps=t)
            else:
                h = cross_to_context(h, "attn2")
            x = h + x

        x_skip = x
        h = LayerNormFp32(name="norm3")(x)
        x = FeedForward(glu=self.gated_ff, dtype=self.dtype, name="ff")(h) + x_skip
        return x


class SpatialVideoTransformer(nn.Module):
    """Spatial transformer with an interleaved temporal stack
    (video_attention.py:146-301). Input (B*T, H, W, C), indicator (B, T)."""

    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_spatial_context: bool = False
    use_linear: bool = False
    ff_in: bool = False
    merge_strategy: str = "fixed"
    merge_factor: float = 0.5
    disable_self_attn: bool = False
    disable_temporal_crossattention: bool = False
    max_time_embed_period: int = 10000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        time_context: Optional[jnp.ndarray] = None,
        timesteps: Optional[int] = None,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        bt, h, w, c = x.shape
        t = timesteps
        assert t is not None and bt % t == 0
        s = h * w
        inner = self.n_heads * self.d_head
        x_in = x

        spatial_context = context
        if self.use_spatial_context:
            assert context is not None and context.ndim == 3
            # One context row per video (frame 0). The reference repeats this
            # per spatial location (video_attention.py:250-257); here the
            # temporal block attends to per-video keys directly, so no repeat.
            time_context = context[::t]
        elif time_context is not None:
            if time_context.ndim == 2:
                time_context = time_context[:, None, :]

        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        if not self.use_linear:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(bt, s, x.shape[-1])
        if self.use_linear:
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)

        # Learned sinusoidal frame-position embedding (video_attention.py:265-276).
        frame_idx = jnp.tile(jnp.arange(t, dtype=jnp.float32), bt // t)
        t_emb = timestep_embedding(
            frame_idx, c, max_period=self.max_time_embed_period
        ).astype(self.dtype)
        emb = nn.Dense(c * 4, dtype=self.dtype, name="time_pos_embed_0")(t_emb)
        emb = nn.silu(emb)
        emb = nn.Dense(c, dtype=self.dtype, name="time_pos_embed_2")(emb)
        emb = emb[:, None, :]  # (B*T, 1, C)

        time_mixer = AlphaBlender(
            alpha=self.merge_factor,
            merge_strategy=self.merge_strategy,
            name="time_mixer",
        )

        for d in range(self.depth):
            x = BasicTransformerBlock(
                n_heads=self.n_heads,
                d_head=self.d_head,
                context_dim=self.context_dim,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype,
                name=f"transformer_blocks_{d}",
            )(x, context=spatial_context)

            # Natural (B*T, S, C) layout end-to-end; VideoTransformerBlock
            # handles the temporal view internally.
            x_mix = VideoTransformerBlock(
                n_heads=self.n_heads,
                d_head=self.d_head,
                context_dim=self.context_dim,
                ff_in=self.ff_in,
                disable_self_attn=self.disable_self_attn,
                disable_temporal_crossattention=self.disable_temporal_crossattention,
                dtype=self.dtype,
                name=f"time_stack_{d}",
            )(x + emb, context=time_context, timesteps=t)

            x = time_mixer(
                x_spatial=x,
                x_temporal=x_mix,
                image_only_indicator=image_only_indicator,
                mode="tokens_bt",
            )

        if self.use_linear:
            x = nn.Dense(
                c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="proj_out",
            )(x)
        x = x.reshape(bt, h, w, x.shape[-1])
        if not self.use_linear:
            x = nn.Conv(
                c, (1, 1), kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="proj_out",
            )(x)
        return x + x_in
