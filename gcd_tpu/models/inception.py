"""FID InceptionV3 feature extractor in flax.

Reference: gcd-model/sgm/modules/encoders/modules.py:211-229 wraps the
pytorch-fid port of torchvision InceptionV3 (mseitzer/pytorch-fid
inception.py) — the standard FID feature network. Unused by every GCD config,
but part of the sgm embedder surface.

Architecture notes (matching pytorch-fid exactly):
  * BasicConv2d = conv(no bias) + BatchNorm(eps=1e-3, running stats) + relu
  * FID variants of the torchvision blocks: every in-block avg-pool uses
    count_include_pad=False, and Mixed_7c (FIDInceptionE_2) uses a MAX pool
    in its pool branch (a known quirk of the original TF checkpoint).
  * resize_input: bilinear 299x299 (align_corners=False, no antialias —
    torch F.interpolate defaults); normalize_input: [0,1] -> [-1,1].
  * Feature taps after block0 (64ch), block1 (192), block2 (768) and
    block3's global average pool (2048); DEFAULT_BLOCK_INDEX = 3.

Weights: convert a local pytorch-fid checkpoint (pt_inception-2015-12-05)
with `convert_fid_inception_state_dict` — no network egress exists here, so
like LPIPS the weights must be supplied.

NHWC throughout. Average pools that exclude padding are implemented as a
ones-mask normalization (reduce_window sums / valid-count).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gcd_tpu.utils.config import register

Dtype = Any


def _avg_pool_no_pad(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """3x3 stride-1 avg pool, padding 1, count_include_pad=False."""
    p = window // 2
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (p, p), (p, p), (0, 0)])
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (p, p), (p, p), (0, 0)])
    return summed / count


def _max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2,
              pad: int = 0) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_channels, self.kernel, strides=(self.stride, self.stride),
            padding=(self.padding[0], self.padding[1]) if isinstance(
                self.padding, tuple) else self.padding,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _conv(out, kernel, stride=1, padding=(0, 0), name=None, dtype=jnp.float32):
    if isinstance(padding, int):
        padding = (padding, padding)
    return BasicConv2d(out, kernel, stride, padding, dtype=dtype, name=name)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = _conv(64, (1, 1), name="branch1x1", dtype=d)(x)
        b5 = _conv(48, (1, 1), name="branch5x5_1", dtype=d)(x)
        b5 = _conv(64, (5, 5), padding=2, name="branch5x5_2", dtype=d)(b5)
        b3 = _conv(64, (1, 1), name="branch3x3dbl_1", dtype=d)(x)
        b3 = _conv(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=d)(b3)
        b3 = _conv(96, (3, 3), padding=1, name="branch3x3dbl_3", dtype=d)(b3)
        bp = _avg_pool_no_pad(x)
        bp = _conv(self.pool_features, (1, 1), name="branch_pool", dtype=d)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = _conv(384, (3, 3), stride=2, name="branch3x3", dtype=d)(x)
        bd = _conv(64, (1, 1), name="branch3x3dbl_1", dtype=d)(x)
        bd = _conv(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=d)(bd)
        bd = _conv(96, (3, 3), stride=2, name="branch3x3dbl_3", dtype=d)(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        c7 = self.channels_7x7
        b1 = _conv(192, (1, 1), name="branch1x1", dtype=d)(x)
        b7 = _conv(c7, (1, 1), name="branch7x7_1", dtype=d)(x)
        b7 = _conv(c7, (1, 7), padding=(0, 3), name="branch7x7_2", dtype=d)(b7)
        b7 = _conv(192, (7, 1), padding=(3, 0), name="branch7x7_3", dtype=d)(b7)
        bd = _conv(c7, (1, 1), name="branch7x7dbl_1", dtype=d)(x)
        bd = _conv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2", dtype=d)(bd)
        bd = _conv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3", dtype=d)(bd)
        bd = _conv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4", dtype=d)(bd)
        bd = _conv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5", dtype=d)(bd)
        bp = _avg_pool_no_pad(x)
        bp = _conv(192, (1, 1), name="branch_pool", dtype=d)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = _conv(192, (1, 1), name="branch3x3_1", dtype=d)(x)
        b3 = _conv(320, (3, 3), stride=2, name="branch3x3_2", dtype=d)(b3)
        b7 = _conv(192, (1, 1), name="branch7x7x3_1", dtype=d)(x)
        b7 = _conv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2", dtype=d)(b7)
        b7 = _conv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3", dtype=d)(b7)
        b7 = _conv(192, (3, 3), stride=2, name="branch7x7x3_4", dtype=d)(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # "avg" (Mixed_7b) or "max" (FID Mixed_7c quirk)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = _conv(320, (1, 1), name="branch1x1", dtype=d)(x)
        b3 = _conv(384, (1, 1), name="branch3x3_1", dtype=d)(x)
        b3a = _conv(384, (1, 3), padding=(0, 1), name="branch3x3_2a", dtype=d)(b3)
        b3b = _conv(384, (3, 1), padding=(1, 0), name="branch3x3_2b", dtype=d)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = _conv(448, (1, 1), name="branch3x3dbl_1", dtype=d)(x)
        bd = _conv(384, (3, 3), padding=1, name="branch3x3dbl_2", dtype=d)(bd)
        bda = _conv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a", dtype=d)(bd)
        bdb = _conv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b", dtype=d)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool_no_pad(x)
        bp = _conv(192, (1, 1), name="branch_pool", dtype=d)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@register("sgm.modules.encoders.modules.InceptionV3")
class InceptionV3(nn.Module):
    """pytorch-fid InceptionV3 (modules.py:211-229): returns the selected
    feature blocks; with the default single block [3] the squeezed (N, 2048)
    pool features (the reference squeezes single outputs, :224-227)."""

    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True  # forced True by the reference wrapper (:219)
    normalize_input: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        assert max(self.output_blocks) <= 3
        d = self.dtype
        outs: List[jnp.ndarray] = []
        if self.resize_input:
            n, h, w, c = x.shape
            x = jax.image.resize(x.astype(jnp.float32), (n, 299, 299, c),
                                 method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = x.astype(d)

        # block 0 -> 64ch
        x = _conv(32, (3, 3), stride=2, name="Conv2d_1a_3x3", dtype=d)(x)
        x = _conv(32, (3, 3), name="Conv2d_2a_3x3", dtype=d)(x)
        x = _conv(64, (3, 3), padding=1, name="Conv2d_2b_3x3", dtype=d)(x)
        x = _max_pool(x, 3, 2)
        if 0 in self.output_blocks:
            outs.append(x)
        # block 1 -> 192ch
        if max(self.output_blocks) >= 1:
            x = _conv(80, (1, 1), name="Conv2d_3b_1x1", dtype=d)(x)
            x = _conv(192, (3, 3), name="Conv2d_4a_3x3", dtype=d)(x)
            x = _max_pool(x, 3, 2)
            if 1 in self.output_blocks:
                outs.append(x)
        # block 2 -> 768ch
        if max(self.output_blocks) >= 2:
            x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
            x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
            x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
            x = InceptionB(dtype=d, name="Mixed_6a")(x)
            x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
            x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
            x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
            x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
            if 2 in self.output_blocks:
                outs.append(x)
        # block 3 -> 2048ch pooled
        if max(self.output_blocks) >= 3:
            x = InceptionD(dtype=d, name="Mixed_7a")(x)
            x = InceptionE("avg", dtype=d, name="Mixed_7b")(x)
            x = InceptionE("max", dtype=d, name="Mixed_7c")(x)
            x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg (1,1)
            if 3 in self.output_blocks:
                outs.append(x)

        if len(outs) == 1:
            # NHWC (N,1,1,2048) -> squeeze, like the reference wrapper
            return jnp.squeeze(outs[0])
        return outs


def convert_fid_inception_state_dict(
    sd: Dict[str, np.ndarray], template: Dict
) -> Tuple[Dict, List[str]]:
    """Fill an InceptionV3 variables template ({'params', 'batch_stats'}) from
    a pytorch-fid state dict. Returns (variables, missing_keys)."""
    from gcd_tpu.io.convert import _iter_tree_paths, _set_in_tree

    out: Dict = {"params": {}, "batch_stats": {}}
    missing: List[str] = []

    def torch_key(path):
        segs = list(path)
        leaf = segs.pop()
        base = ".".join(segs)
        if leaf == "kernel":
            return f"{base}.weight", "conv"
        if leaf == "scale":
            return f"{base}.weight", "plain"
        if leaf in ("bias", "mean", "var"):
            name = {"bias": "bias", "mean": "running_mean",
                    "var": "running_var"}[leaf]
            return f"{base}.{name}", "plain"
        return f"{base}.{leaf}", "plain"

    for col in ("params", "batch_stats"):
        for path, leaf in _iter_tree_paths(template.get(col, {})):
            key, kind = torch_key(path)
            if key not in sd:
                missing.append(key)
                continue
            arr = np.asarray(sd[key])
            if kind == "conv" and arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)
            if arr.shape != tuple(leaf.shape):
                raise ValueError(f"{key}: {arr.shape} != {tuple(leaf.shape)}")
            _set_in_tree(out[col], path, jnp.asarray(arr, leaf.dtype))
    return out, missing
