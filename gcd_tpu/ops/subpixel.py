"""Nearest-2x upsample folded into the following 3x3 conv (subpixel conv).

Every decoder/UNet upsample in the reference is `nearest_2x -> conv3x3`
(openaimodel.py:110-160, model.py:58-72). On the upsampled grid each output
pixel's 3x3 window covers only a 2x2 patch of *distinct* input pixels (the
other taps hit nearest-duplicates), so the conv folds exactly into four
2x2-tap convs — one per output phase (dh, dw) — with kernels formed by
summing the taps that land on the same input pixel:

    out[2i+0] reads rows (i-1, i) with taps (k0, k1+k2)
    out[2i+1] reads rows (i,  i+1) with taps (k0+k1, k2)      (same along W)

All four phases run as ONE VALID 2x2 conv with 4*Cout output channels over
the 1-padded input, followed by a depth-to-space interleave. FLOPs drop from
36*HW*Cin*Cout MACs (3x3 conv on the 4x-area upsampled grid) to
~16*HW*Cin*Cout — 2.25x less on convs worth ~17% of a denoiser step and
~23% of the VAE decode (scripts/perf_report.py) — and the MXU contraction
dim grows from 9*Cin per tap-row to a denser 2x2 kernel.

The folding is an exact rearrangement of the same multiply-adds (weight
sums done in fp32); parity with the naive path is tested to fp32 tolerance
in tests/test_subpixel.py. Gated by the `subpix_upsample` dispatch flag.

TPU-measured (round 2, v5e, 14f 384x256 25-step bench): NEUTRAL end-to-end —
clip 2740 ms on vs 2737 ms off; decode-only 263.1 ms on vs 264.0 ms off.
The 2.25x MAC reduction buys nothing because these convs are dominated by
the GroupNorm-stat epilogue fusions' HBM traffic, not MXU time (see
INVENTORY.md "Known headroom"). Default stays OFF: identical math, but the
unfused path keeps the simplest HLO and the measured times are equal.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def fold_upsample_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) conv kernel -> (2, 2, Cin, 4*Cout) phase kernel.

    Output channel blocks are ordered by phase (dh, dw):
    [(0,0), (0,1), (1,0), (1,1)]. Folding sums run in fp32."""
    k = kernel.astype(jnp.float32)
    rows = [
        jnp.stack([k[0], k[1] + k[2]], axis=0),  # dh=0: rows (i-1, i)
        jnp.stack([k[0] + k[1], k[2]], axis=0),  # dh=1: rows (i, i+1)
    ]
    phases = []
    for r in rows:
        phases.append(jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1))
        phases.append(jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1))
    return jnp.concatenate(phases, axis=-1)


def upsample2x_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: Optional[jnp.ndarray],
                       dtype=None) -> jnp.ndarray:
    """Fused nearest-2x upsample + 3x3 conv (padding 1).

    x: (N, H, W, Cin); kernel: (3, 3, Cin, Cout); returns (N, 2H, 2W, Cout).
    Matches `conv3x3(nearest_upsample_2x(x))` up to fp summation order."""
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    cd = dtype or x.dtype
    k4 = fold_upsample_kernel(kernel).astype(cd)
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(cd)
    y = jax.lax.conv_general_dilated(
        p, k4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # y: (N, H+1, W+1, 4*Cout); phase (dh, dw) lives at spatial offset
    # (dh, dw) in y and channel block [phase*Cout : (phase+1)*Cout].
    p00 = y[:, :h, :w, :cout]
    p01 = y[:, :h, 1:, cout:2 * cout]
    p10 = y[:, 1:, :w, 2 * cout:3 * cout]
    p11 = y[:, 1:, 1:, 3 * cout:]
    ph = jnp.stack([p00, p01, p10, p11], axis=-2)
    ph = ph.reshape(n, h, w, 2, 2, cout)
    out = ph.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
