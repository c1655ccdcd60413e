"""UNet residual blocks and resampling layers.

Behavioral reference: gcd-model/sgm/modules/diffusionmodules/openaimodel.py
(ResBlock :213, Upsample :110, Downsample :163) and video_model.py
(VideoResBlock :12).

NHWC layout. The temporal ResBlock operates on (B, T, H, W, C) with a
(kt, kh, kw) kernel — GCD uses video_kernel_size [3, 1, 1]: a pure time-mixing
conv, which on TPU lowers to a small stencil over the T axis. The reference's
`exchange_temb_dims` rearrange (openaimodel.py:349) is unnecessary here: in
channels-last layout the (B, T, C) embedding broadcasts directly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from gcd_tpu.ops.basic import nearest_upsample_2x
from flax import linen as nn

from gcd_tpu.models.layers import AlphaBlender, GroupNorm32

Dtype = Any


def _pad_for_kernel(kernel_size: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    return tuple((k // 2, k // 2) for k in kernel_size)


class Upsample(nn.Module):
    """2x nearest upsample + optional 3x3 conv (openaimodel.py:110-160)."""

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.out_channels or x.shape[-1]
        if not self.use_conv:
            return nearest_upsample_2x(x)
        from gcd_tpu.models.layers import _ConvParams
        from gcd_tpu.ops.dispatch import kernel_enabled
        from gcd_tpu.ops.subpixel import upsample2x_conv3x3

        kernel, bias = _ConvParams(out_ch, name="conv")(x.shape[-1])
        if kernel_enabled("subpix_upsample"):
            return upsample2x_conv3x3(x, kernel, bias, dtype=self.dtype)
        x = nearest_upsample_2x(x)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)


class Downsample(nn.Module):
    """stride-2 3x3 conv (pad 1 both sides, matching torch) or avg-pool
    (openaimodel.py:163-210)."""

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        out_ch = self.out_channels or c
        if self.use_conv:
            return nn.Conv(
                out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name="op",
            )(x)
        assert out_ch == c
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """GroupNorm-SiLU-conv x2 with timestep-embedding injection
    (openaimodel.py:213-357). Works for 2D (N, H, W, C) and 3D (B, T, H, W, C)
    inputs — `kernel_size` rank selects the conv rank."""

    out_channels: Optional[int] = None
    kernel_size: Union[int, Sequence[int]] = 3
    use_scale_shift_norm: bool = False
    use_conv_skip: bool = False
    up: bool = False
    down: bool = False
    skip_t_emb: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = x.shape[-1]
        out_ch = self.out_channels or c
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks,) * (x.ndim - 2)
        ks = tuple(ks)
        pad = _pad_for_kernel(ks)

        # Opt-in: route the plain 2D chains through the fused GN->SiLU->conv3x3
        # Pallas op (param trees match GroupNorm32 + nn.Conv exactly, so
        # checkpoints are oblivious). Parked OFF by default: the kernel beats
        # the isolated XLA chain (0.66 vs 0.79 ms at ds1) but loses in-UNet
        # (141.8 vs 135.8 ms/step) — the opaque kernel boundary costs XLA more
        # epilogue fusions around the ResBlock than the fused GN saves.
        from gcd_tpu.ops.dispatch import kernel_enabled

        def conv(features, name, zero_init=False):
            """nn.Conv, except (kt,1,1) temporal kernels route through the
            im2col-matmul formulation (ops/temporal_conv.py) — identical param
            tree and math, ~2.5x faster than XLA's 3D conv on v5e."""
            if len(ks) == 3 and ks[1:] == (1, 1):
                from gcd_tpu.ops.temporal_conv import TemporalConvK11

                return TemporalConvK11(features=features, kt=ks[0],
                                       zero_init=zero_init, dtype=self.dtype,
                                       name=name)
            if ks == (3, 3):
                from gcd_tpu.ops.spatial_conv import SpatialConv3x3

                return SpatialConv3x3(features=features, zero_init=zero_init,
                                      dtype=self.dtype, name=name)
            kinit = (nn.initializers.zeros if zero_init
                     else nn.initializers.lecun_normal())
            return nn.Conv(features, ks, padding=pad, kernel_init=kinit,
                           dtype=self.dtype, name=name)

        fused_2d = (kernel_enabled("fused_gn_conv")
                    and not self.up and not self.down
                    and ks == (3, 3) and x.ndim == 4)
        if fused_2d:
            from gcd_tpu.ops.fused_gn_conv import (
                Conv3x3Params,
                GN32Params,
                gn_silu_conv3x3,
            )

            nscale, nbias = GN32Params(c, name="in_layers_0")()
            wk, bk = Conv3x3Params(out_ch, c, name="in_layers_2")()
            h = gn_silu_conv3x3(x, nscale, nbias, wk.astype(self.dtype),
                                bk, silu=True)
        else:
            h = GroupNorm32(silu=True, name="in_layers_0")(x)
            if self.up:
                h = Upsample(use_conv=False, dtype=self.dtype, name="h_upd")(h)
                x = Upsample(use_conv=False, dtype=self.dtype, name="x_upd")(x)
            elif self.down:
                h = Downsample(use_conv=False, dtype=self.dtype, name="h_upd")(h)
                x = Downsample(use_conv=False, dtype=self.dtype, name="x_upd")(x)
            h = conv(out_ch, "in_layers_2")(h)

        if self.skip_t_emb:
            emb_out = jnp.zeros_like(h)
        else:
            emb_ch = 2 * out_ch if self.use_scale_shift_norm else out_ch
            emb_out = nn.Dense(emb_ch, dtype=self.dtype, name="emb_layers_1")(
                nn.silu(emb)
            )
            # Broadcast over spatial dims: (N, C) -> (N, 1, 1, C) for 2D inputs,
            # (B, T, C) -> (B, T, 1, 1, C) for 3D — channels-last needs no
            # exchange_temb_dims.
            while emb_out.ndim < h.ndim:
                emb_out = jnp.expand_dims(emb_out, axis=-2)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_layers_0")(h) * (1 + scale) + shift
            h = nn.silu(h)
            h = conv(out_ch, "out_layers_3", zero_init=True)(h)
        elif fused_2d:
            from gcd_tpu.ops.fused_gn_conv import (
                Conv3x3Params,
                GN32Params,
                gn_silu_conv3x3,
            )

            h = h + emb_out.astype(h.dtype)
            nscale, nbias = GN32Params(out_ch, name="out_layers_0")()
            wk, bk = Conv3x3Params(out_ch, out_ch, zero_init=True,
                                   name="out_layers_3")()
            h = gn_silu_conv3x3(h, nscale, nbias, wk.astype(self.dtype),
                                bk, silu=True)
        else:
            h = h + emb_out.astype(h.dtype)
            h = GroupNorm32(silu=True, name="out_layers_0")(h)
            h = conv(out_ch, "out_layers_3", zero_init=True)(h)

        if out_ch == c:
            skip = x
        elif self.use_conv_skip:
            skip = nn.Conv(
                out_ch, ks, padding=pad, dtype=self.dtype, name="skip_connection"
            )(x)
        else:
            skip = nn.Conv(out_ch, (1,) * len(ks), dtype=self.dtype,
                           name="skip_connection")(x)
        return skip + h


class VideoResBlock(nn.Module):
    """Spatial ResBlock + 3D time-mix ResBlock, AlphaBlender merge
    (video_model.py:12-82). Input (B*T, H, W, C), indicator (B, T)."""

    out_channels: Optional[int] = None
    video_kernel_size: Union[int, Sequence[int]] = 3
    merge_strategy: str = "fixed"
    merge_factor: float = 0.5
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        emb: jnp.ndarray,
        image_only_indicator: Optional[jnp.ndarray],
        num_video_frames: int,
    ) -> jnp.ndarray:
        t = num_video_frames
        x = ResBlock(
            out_channels=self.out_channels,
            use_scale_shift_norm=self.use_scale_shift_norm,
            up=self.up,
            down=self.down,
            dtype=self.dtype,
            name="spatial",
        )(x, emb)

        bt, h, w, c = x.shape
        b = bt // t
        x_vid = x.reshape(b, t, h, w, c)
        x_mix = x_vid

        emb_vid = emb.reshape(b, t, emb.shape[-1])
        x_vid = ResBlock(
            out_channels=self.out_channels or c,
            kernel_size=self.video_kernel_size,
            use_scale_shift_norm=False,
            dtype=self.dtype,
            name="time_stack",
        )(x_vid, emb_vid)

        x_out = AlphaBlender(
            alpha=self.merge_factor,
            merge_strategy=self.merge_strategy,
            name="time_mixer",
        )(
            x_spatial=x_mix,
            x_temporal=x_vid,
            image_only_indicator=image_only_indicator,
            mode="video_nthwc",
        )
        return x_out.reshape(bt, h, w, c)
