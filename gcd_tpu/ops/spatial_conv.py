"""Spatial 3x3 SAME convs as im2col MXU matmuls (experiment, off by default).

Rationale: the round-2 xprof shows XLA's conv fusions at ~40-80 effective
TF/s on the UNet's [28,HW,C] shapes while XLA-native dots and the Pallas MLP
matmuls reach ~157 TF/s. A 3x3 conv is an im2col: concatenate the 9
(dy,dx)-shifted zero-padded copies of the input along channels and do ONE
[B*HW, 9C] x [9C, Co] matmul — the same rewrite that took the (kt,1,1)
temporal convs from ~50-67 TF/s to the matmul floor
(ops/temporal_conv.py, 5.04 -> 5.12 f/s e2e).

The open question this flag measured was whether XLA fuses the shift/concat
into the dot's LHS read (as it did for the 3-tap temporal concat) or
materializes the 9x tensor. MEASURED (round 2, v5e, 14f 384x256 25-step
e2e bench): 3.80 f/s vs 5.10 default — XLA materializes the 9x concat for
2D-shifted operands (the temporal case won because its 3 shifts are pure
sublane offsets in one axis; the 2D halo shifts are not), so the matmul
pays ~9x HBM read traffic and loses despite the higher MXU rate. The flag
stays off; kept as the measured record and as a building block should a
fused producer ever make the concat free.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[:, i, j] = x[:, i + dy, j + dx], zero-padded at the borders.
    x: (B, H, W, C)."""
    b, h, w, c = x.shape
    pad = [(0, 0), (max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)),
           (0, 0)]
    xp = jnp.pad(x, pad)
    return xp[:, max(dy, 0):max(dy, 0) + h, max(dx, 0):max(dx, 0) + w]


def conv3x3_im2col(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SAME-padded 3x3 conv on (B, H, W, C) via one im2col matmul.

    kernel: (3, 3, C, Co) HWIO; tap (ky, kx) reads pixel
    (i + ky - 1, j + kx - 1), matching SAME zero padding.
    """
    kh, kw, c, co = kernel.shape
    assert kh == 3 and kw == 3, kernel.shape
    b, h, w, _ = x.shape
    xcat = jnp.concatenate(
        [_shift2d(x, ky - 1, kx - 1) for ky in range(3) for kx in range(3)],
        axis=-1)
    out = xcat.reshape(b * h * w, 9 * c) @ kernel.reshape(9 * c, co)
    if bias is not None:
        out = out + bias
    return out.reshape(b, h, w, co)


class SpatialConv3x3(nn.Module):
    """nn.Conv(features, (3,3), SAME)-compatible module that runs the im2col
    matmul formulation when the `sconv_matmul` dispatch flag is on —
    identical param tree (kernel (3,3,C,Co), bias (Co,)), identical init and
    math; checkpoints and converters are oblivious."""

    features: int
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kinit = (nn.initializers.zeros if self.zero_init
                 else nn.initializers.lecun_normal())
        kernel = self.param("kernel", kinit, (3, 3, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        from gcd_tpu.ops.dispatch import kernel_enabled

        if not kernel_enabled("sconv_matmul"):
            import jax.lax as lax

            out = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out + bias.astype(self.dtype)
        return conv3x3_im2col(x.astype(self.dtype), kernel.astype(self.dtype),
                              bias.astype(self.dtype))
