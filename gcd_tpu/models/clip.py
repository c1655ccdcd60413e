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

Preprocessing matches modules.py:703-715 exactly: kornia.geometry.resize to
224 with interpolation="bicubic", align_corners=True, antialias=True — which
kornia implements as a separable gaussian pre-blur (sigma=(factor-1)/2 per
axis, reflect padding, only when downscaling) followed by torch bicubic
(A=-0.75, corner-aligned source grid, clamped borders) — then [-1,1] -> [0,1]
and CLIP mean/std normalize. Both stages are linear with a fixed 224 target,
so they are folded into one (224, H_in) / (224, W_in) matrix per axis and the
resize runs as two matmuls on the MXU (tests/test_clip_tower_parity.py checks
the fold against a torch oracle of the kornia ops).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional

import numpy as np
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


def _cubic_kernel(d: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch's cubic convolution (aten UpSample.h, A=-0.75) at distances d."""
    ad = np.abs(d)
    near = ((a + 2.0) * ad - (a + 3.0)) * ad * ad + 1.0
    far = (((a * ad - 5.0 * a) * ad + 8.0 * a) * ad) - 4.0 * a
    return np.where(ad <= 1.0, near, np.where(ad < 2.0, far, 0.0))


def _bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix of torch bicubic with align_corners=True: source
    positions dst*(in-1)/(out-1), 4 taps clamped to the border."""
    if out_size == 1:
        src = np.zeros((1,), np.float32)
    else:
        # torch computes the source position in float32 (scalar_t); doing it
        # in f64 gives sub-pixel offsets ~1e-8 px that noise-image gradients
        # amplify to ~5e-5 value differences vs the torch oracle.
        scale = np.float32(in_size - 1) / np.float32(out_size - 1)
        src = np.arange(out_size, dtype=np.float32) * scale
    x0 = np.floor(src).astype(np.int64)
    t = (src - x0.astype(np.float32)).astype(np.float64)
    mat = np.zeros((out_size, in_size))
    rows = np.arange(out_size)
    for k in range(-1, 3):
        idx = np.clip(x0 + k, 0, in_size - 1)
        np.add.at(mat, (rows, idx), _cubic_kernel(t - k))
    return mat


def _gaussian_blur_matrix(size: int, sigma: float) -> np.ndarray:
    """(size, size) matrix of kornia.filters.gaussian_blur2d along one axis:
    odd kernel of width max(4*sigma, 3), reflect ('reflect101') padding."""
    ks = int(max(2.0 * 2.0 * sigma, 3.0))
    if ks % 2 == 0:
        ks += 1
    xs = np.arange(ks) - ks // 2
    g = np.exp(-(xs.astype(np.float64) ** 2) / (2.0 * sigma**2))
    g /= g.sum()
    mat = np.zeros((size, size))
    rows = np.arange(size)
    for j in range(ks):
        idx = rows + (j - ks // 2)
        idx = np.where(idx < 0, -idx, idx)
        idx = np.where(idx >= size, 2 * (size - 1) - idx, idx)
        np.add.at(mat, (rows, idx), g[j])
    return mat


@lru_cache(maxsize=64)
def _kornia_resize_matrices(in_h: int, in_w: int, out_h: int, out_w: int,
                            antialias: bool):
    """Per-axis (out, in) f32 matrices reproducing kornia.geometry.resize
    (modules.py:705-710): gaussian pre-blur folded into corner-aligned
    bicubic. Kornia blurs BOTH axes whenever max(in/out) > 1, with the
    per-axis sigma floored at 0.001 (≈ identity for an upscaling axis)."""
    my = _bicubic_matrix(in_h, out_h)
    mx = _bicubic_matrix(in_w, out_w)
    fy, fx = in_h / out_h, in_w / out_w
    if antialias and max(fy, fx) > 1.0:
        my = my @ _gaussian_blur_matrix(in_h, max((fy - 1.0) / 2.0, 0.001))
        mx = mx @ _gaussian_blur_matrix(in_w, max((fx - 1.0) / 2.0, 0.001))
    return my.astype(np.float32), mx.astype(np.float32)


def clip_preprocess(x: jnp.ndarray, image_size: int = 224,
                    antialias: bool = True) -> jnp.ndarray:
    """(N, H, W, 3) in [-1, 1] -> (N, 224, 224, 3) CLIP-normalized
    (modules.py:703-715, kornia align_corners=True semantics)."""
    n, h, w, c = x.shape
    x = x.astype(jnp.float32)
    if (h, w) != (image_size, image_size):
        my, mx = _kornia_resize_matrices(h, w, image_size, image_size,
                                         antialias)
        x = jnp.einsum("oh,nhwc->nowc", jnp.asarray(my), x)
        x = jnp.einsum("ow,nhwc->nhoc", jnp.asarray(mx), x)
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std
