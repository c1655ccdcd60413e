"""Temporal (kt,1,1) convolutions as MXU matmuls.

The UNet's VideoResBlock `time_stack` and the VideoDecoder's temporal convs
are 3D convs with kernel [3,1,1] on (B, T, H, W, C) videos
(video_model.py:12-82, temporal_ae.py:33-45,86-107 — GCD configs set
`video_kernel_size: [3, 1, 1]` everywhere). XLA lowers them as real
convolutions; profiled on v5e they reach only ~50-67 TF/s (the T window of 3
and the (2,14,H,W,C) layout tile the MXU poorly) while the equivalent
matmuls run at ~160+ TF/s, and these convs are ~13% of the sampling step.

A (kt,1,1) conv is exactly an im2col over T: concatenate the kt T-shifted
(zero-padded) copies of the input along channels and do ONE matmul with the
(kt*C, Co) reshaped kernel — contraction dim kt*C keeps the MXU busy, and
XLA fuses the shift/concat into the matmul's LHS read.

The im2col form is only profitable at small spatial dims, though. At the
UNet's latent resolutions (<= 48x32 tokens/frame) the concat stays
tile-resident and the single big-contraction matmul wins (5.04 -> 5.12 f/s
e2e). At the VAE decoder's resolutions XLA *materializes* the (B*T,H,W,kt*C)
concat in HBM and then relayout-copies it — >1 GB of pure traffic per conv at
256x384x128 (v5e xprof: 3.6 ms loop-fusion build + 3.4 ms copy + 2 ms matmul
per conv, ~46% of the whole decode leg) — while the XLA 3D conv handles the
same shapes in a fraction of that (decode 264 -> 154 ms measured). Hence the
shape-aware dispatch in `_im2col_profitable`: matmul form below
`GCD_TCONV_MAX_ELEMS` (default 600k) h*w*c elements/frame, lax 3D conv above.

`TemporalConvK11` is a drop-in for `nn.Conv(features, (kt,1,1), SAME)`:
identical param tree (kernel (kt,1,1,C,Co), bias (Co,)), identical init,
identical math — checkpoints and converters are oblivious. Dispatch between
the matmul path and nn.Conv is the `tconv_matmul` kernel flag plus the
spatial-size heuristic.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _im2col_profitable(h: int, w: int, c: int) -> bool:
    """im2col matmul form only below a per-frame working-set threshold
    (h*w*c elements — the size of the tensor the concat triples). v5e
    measurements: every UNet time_stack shape (320ch@48x32=491k,
    640ch@24x16=245k, 1280ch@12x8=123k) wins as a matmul, while every VAE
    decoder shape loses — including the 512ch@48x32=786k mid blocks
    (decode-leg medians 158.5 ms with them as matmuls vs 155.7 ms as convs).
    GCD_TCONV_MAX_ELEMS overrides the threshold for A/B sweeps (0 disables
    im2col everywhere)."""
    return h * w * c <= int(os.environ.get("GCD_TCONV_MAX_ELEMS", "600000"))


def _tshift(x: jnp.ndarray, off: int) -> jnp.ndarray:
    """out[:, t] = x[:, t + off], zero-padded at the T boundaries."""
    if off == 0:
        return x
    if off > 0:
        return jnp.concatenate(
            [x[:, off:], jnp.zeros_like(x[:, :off])], axis=1)
    return jnp.concatenate(
        [jnp.zeros_like(x[:, off:]), x[:, :off]], axis=1)


def temporal_conv_k11(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SAME-padded (kt,1,1) conv on (B, T, H, W, C) via one im2col matmul.

    kernel: (kt, 1, 1, C, Co) in nn.Conv HWIO-style layout; tap i reads
    frame t + (i - kt//2), matching SAME zero padding.
    """
    kt, k1, k2, c, co = kernel.shape
    assert k1 == 1 and k2 == 1, kernel.shape
    b, t, h, w, _ = x.shape
    center = kt // 2
    xcat = jnp.concatenate(
        [_tshift(x, i - center) for i in range(kt)], axis=-1)
    out = xcat.reshape(b * t * h * w, kt * c) @ kernel.reshape(kt * c, co)
    if bias is not None:
        out = out + bias
    return out.reshape(b, t, h, w, co)


def temporal_conv_k11_split(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Output-split formulation for the big (decoder-resolution) shapes.

    By linearity, out[t] = sum_i (x @ w_i)[t + i - kt//2]: run ONE matmul
    against the channel-concatenated weights (C, kt*Co) — K=C and N=kt*Co
    both lane-aligned at the decoder's 128..512 channels — then combine the
    kt per-tap outputs with T-shifted adds, which XLA fuses into a single
    elementwise pass. Unlike the im2col form nothing 3x-sized is
    materialized on the INPUT side, and unlike the lax 3D conv there is no
    (T,H,8,48,C) spatial-split relayout: the v5e xprof of the decode leg
    showed 2.3 ms of pure data-formatting copies around each 3D conv at
    256x384x128 plus the conv itself at ~63 TF/s."""
    kt, k1, k2, c, co = kernel.shape
    assert k1 == 1 and k2 == 1, kernel.shape
    b, t, h, w, _ = x.shape
    center = kt // 2
    # (kt,1,1,C,Co) -> (C, kt*Co); tap i occupies columns [i*co:(i+1)*co).
    wcat = jnp.moveaxis(kernel.reshape(kt, c, co), 0, 1).reshape(c, kt * co)
    y = (x.reshape(-1, c) @ wcat).reshape(b, t, h, w, kt, co)
    out = y[:, :, :, :, center, :]
    for i in range(kt):
        if i != center:
            out = out + _tshift(y[:, :, :, :, i, :], i - center)
    if bias is not None:
        out = out + bias
    return out


class TemporalConvK11(nn.Module):
    """nn.Conv(features, (kt,1,1), SAME)-compatible module that runs the
    matmul formulation when the `tconv_matmul` dispatch flag is on."""

    features: int
    kt: int = 3
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kinit = (nn.initializers.zeros if self.zero_init
                 else nn.initializers.lecun_normal())
        kernel = self.param("kernel", kinit, (self.kt, 1, 1, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        from gcd_tpu.ops.dispatch import kernel_enabled

        if not (kernel_enabled("tconv_matmul")
                and _im2col_profitable(x.shape[2], x.shape[3], c)):
            if kernel_enabled("tconv_split"):
                return temporal_conv_k11_split(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    bias.astype(self.dtype))
            import jax.lax as lax

            pad = ((self.kt // 2, (self.kt - 1) // 2), (0, 0), (0, 0))
            out = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1, 1, 1), padding=pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return out + bias.astype(self.dtype)
        return temporal_conv_k11(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype))
