"""OpenCLIP ViT-H/14 visual tower in flax.

Replaces the reference's `open_clip.create_model_and_transforms("ViT-H-14")`
visual branch (gcd-model/sgm/modules/encoders/modules.py:653-726). Only the
vision transformer is needed (the text transformer is deleted in the reference
too). Weights are converted from the SVD checkpoint's
`conditioner.embedders.0.open_clip.model.visual.*` tensors.

Architecture (open_clip ViT-H/14): patch 14, width 1280, 32 layers, 16 heads,
MLP ratio 4, exact GELU (laion2b checkpoints; QuickGELU is only for OpenAI
weights), pre-LN transformer, cls-token pooling, final LayerNorm + projection
to 1024.

Preprocessing matches modules.py:703-715: resize to 224 (bicubic, antialias),
[-1,1] -> [0,1], then CLIP mean/std normalize. NOTE: jax.image.resize uses
half-pixel sampling (align_corners=False) while the reference's kornia call
uses align_corners=True — a sub-pixel difference flagged for the numerics
parity pass.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class MHA(nn.Module):
    """torch.nn.MultiheadAttention-compatible self-attention (combined qkv)."""

    heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, c = x.shape
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = c // self.heads
        q = q.reshape(b, s, self.heads, d)
        k = k.reshape(b, s, self.heads, d)
        v = v.reshape(b, s, self.heads, d)
        from gcd_tpu.ops.attention import dot_product_attention

        out = dot_product_attention(q, k, v, causal=self.causal).reshape(b, s, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPBlock(nn.Module):
    heads: int
    causal: bool = False
    quick_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        x = x + MHA(heads=self.heads, causal=self.causal, dtype=self.dtype,
                    name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        h = nn.Dense(x.shape[-1] * 4, dtype=self.dtype, name="mlp_c_fc")(h)
        if self.quick_gelu:
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """ViT visual encoder returning the projected cls embedding (N, output_dim)."""

    width: int = 1280
    layers: int = 32
    heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    output_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, 224, 224, 3) already CLIP-normalized."""
        n = x.shape[0]
        grid = self.image_size // self.patch_size

        h = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            name="conv1",
        )(x.astype(self.dtype))
        h = h.reshape(n, grid * grid, self.width)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width,),
        ).astype(h.dtype)
        h = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.width)), h], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.width**-0.5),
            (grid * grid + 1, self.width),
        ).astype(h.dtype)
        h = h + pos[None]

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(
            h.astype(jnp.float32)
        ).astype(h.dtype)

        for i in range(self.layers):
            h = CLIPBlock(heads=self.heads, dtype=self.dtype,
                          name=f"resblocks_{i}")(h)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(
            h.astype(jnp.float32)
        ).astype(h.dtype)
        pooled = h[:, 0]
        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width, self.output_dim),
        ).astype(pooled.dtype)
        return pooled @ proj


def clip_preprocess(x: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """(N, H, W, 3) in [-1, 1] -> (N, 224, 224, 3) CLIP-normalized
    (modules.py:703-715)."""
    n, h, w, c = x.shape
    x = jax.image.resize(
        x.astype(jnp.float32), (n, image_size, image_size, c), method="bicubic",
        antialias=True,
    )
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std
