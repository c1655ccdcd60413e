"""The SVD spatiotemporal VideoUNet (reference: gcd-model/sgm/modules/diffusionmodules/
video_model.py:84-540), including GCD's `aux_label_emb` camera-conditioning head
(video_model.py:189-200, 488-497).

Interface (NHWC, flattened video batch):
    x:        (B*T, H, W, in_channels)  — latent + concat-cond channels
    timesteps:(B*T,)                    — c_noise from the denoiser
    context:  (B*T, L, context_dim)     — CLIP-image crossattn tokens
    y:        (B*T, adm_in_channels [+ aux_emb_dim]) — ADM vector cond; the last
              aux_emb_dim channels (camera embedding) feed `aux_label_emb`
    image_only_indicator: (B, T) zeros for video training
    num_video_frames: static int T

Activation checkpointing: `use_checkpoint=True` remats every VideoResBlock and
SpatialVideoTransformer (jax.checkpoint), mirroring the reference's custom
CheckpointFunction (diffusionmodules/util.py:154-204) but relying on XLA to
recompute the block forward in the backward pass.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from gcd_tpu.models.layers import GroupNorm32
from gcd_tpu.models.resblock import Downsample, Upsample, VideoResBlock
from gcd_tpu.models.video_attention import SpatialVideoTransformer
from gcd_tpu.ops.basic import timestep_embedding
from gcd_tpu.utils.config import register

Dtype = Any


@register("sgm.modules.diffusionmodules.video_model.VideoUNet")
class VideoUNet(nn.Module):
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 2
    num_classes: Optional[Union[int, str]] = None
    use_checkpoint: bool = False
    num_heads: int = -1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    transformer_depth: Union[int, Sequence[int]] = 1
    transformer_depth_middle: Optional[int] = None
    context_dim: Optional[int] = None
    time_downup: bool = False
    time_context_dim: Optional[int] = None
    extra_ff_mix_layer: bool = False
    use_spatial_context: bool = False
    merge_strategy: str = "fixed"
    merge_factor: float = 0.5
    spatial_transformer_attn_type: str = "softmax"
    video_kernel_size: Union[int, Sequence[int]] = 3
    use_linear_in_transformer: bool = False
    adm_in_channels: Optional[int] = None
    aux_emb_dim: int = 0
    aux_zero_init: bool = False
    disable_temporal_crossattention: bool = False
    max_ddpm_temb_period: int = 10000
    dtype: Dtype = jnp.float32

    def _res(self, name: str, out_ch: Optional[int], up: bool = False,
             down: bool = False):
        block_cls = VideoResBlock
        if self.use_checkpoint:
            block_cls = nn.remat(VideoResBlock, static_argnums=(4,))
        return block_cls(
            out_channels=out_ch,
            video_kernel_size=self.video_kernel_size,
            merge_strategy=self.merge_strategy,
            merge_factor=self.merge_factor,
            use_scale_shift_norm=self.use_scale_shift_norm,
            up=up,
            down=down,
            dtype=self.dtype,
            name=name,
        )

    def _attn(self, name: str, ch: int, depth: int):
        if self.num_head_channels == -1:
            n_heads = self.num_heads
            d_head = ch // self.num_heads
        else:
            n_heads = ch // self.num_head_channels
            d_head = self.num_head_channels
        block_cls = SpatialVideoTransformer
        if self.use_checkpoint:
            block_cls = nn.remat(SpatialVideoTransformer, static_argnums=(4,))
        return block_cls(
            n_heads=n_heads,
            d_head=d_head,
            depth=depth,
            context_dim=self.context_dim,
            use_spatial_context=self.use_spatial_context,
            use_linear=self.use_linear_in_transformer,
            ff_in=self.extra_ff_mix_layer,
            merge_strategy=self.merge_strategy,
            merge_factor=self.merge_factor,
            disable_temporal_crossattention=self.disable_temporal_crossattention,
            max_time_embed_period=self.max_ddpm_temb_period,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        time_context: Optional[jnp.ndarray] = None,
        num_video_frames: Optional[int] = None,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        mc = self.model_channels
        time_embed_dim = mc * 4
        depths = (
            [self.transformer_depth] * len(self.channel_mult)
            if isinstance(self.transformer_depth, int)
            else list(self.transformer_depth)
        )
        depth_middle = (
            self.transformer_depth_middle
            if self.transformer_depth_middle is not None
            else depths[-1]
        )

        # --- time embedding -------------------------------------------------
        t_emb = timestep_embedding(timesteps, mc).astype(self.dtype)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = nn.silu(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(emb)

        if self.num_classes is not None:
            assert y is not None and y.shape[0] == x.shape[0]
            assert self.num_classes == "sequential", (
                "GCD/SVD always uses num_classes='sequential'"
            )
            assert self.adm_in_channels is not None
            if self.aux_emb_dim > 0:
                assert y.shape[-1] == self.adm_in_channels + self.aux_emb_dim
                y_main = y[..., : self.adm_in_channels]
                y_aux = y[..., self.adm_in_channels:]
            else:
                y_main = y
                y_aux = None

            lab = nn.Dense(time_embed_dim, dtype=self.dtype, name="label_emb_0_0")(
                y_main.astype(self.dtype)
            )
            lab = nn.silu(lab)
            lab = nn.Dense(time_embed_dim, dtype=self.dtype, name="label_emb_0_2")(lab)
            emb = emb + lab

            if y_aux is not None:
                init = nn.initializers.zeros if self.aux_zero_init else None
                kw0 = dict(kernel_init=init, bias_init=nn.initializers.zeros) if init else {}
                aux = nn.Dense(
                    time_embed_dim, dtype=self.dtype, name="aux_label_emb_0", **kw0
                )(y_aux.astype(self.dtype))
                aux = nn.silu(aux)
                aux = nn.Dense(
                    time_embed_dim, dtype=self.dtype, name="aux_label_emb_2", **kw0
                )(aux)
                emb = emb + aux

        t = num_video_frames
        ioi = image_only_indicator
        if ioi is None:
            ioi = jnp.zeros((x.shape[0] // t, t), dtype=jnp.float32)

        h = x.astype(self.dtype)

        # --- input blocks ---------------------------------------------------
        hs: List[jnp.ndarray] = []
        ch = mc
        ds = 1
        input_block_chans = [mc]

        h = nn.Conv(
            mc, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="input_blocks_0_0",
        )(h)
        hs.append(h)

        block_idx = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = self._res(f"input_blocks_{block_idx}_0", mult * mc)(
                    h, emb, ioi, t
                )
                ch = mult * mc
                if ds in self.attention_resolutions:
                    h = self._attn(f"input_blocks_{block_idx}_1", ch, depths[level])(
                        h, context, time_context, t, ioi
                    )
                hs.append(h)
                input_block_chans.append(ch)
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                ds *= 2
                if self.resblock_updown:
                    h = self._res(f"input_blocks_{block_idx}_0", ch, down=True)(
                        h, emb, ioi, t
                    )
                else:
                    h = Downsample(
                        out_channels=ch, use_conv=self.conv_resample,
                        dtype=self.dtype, name=f"input_blocks_{block_idx}_0",
                    )(h)
                hs.append(h)
                input_block_chans.append(ch)
                block_idx += 1

        # --- middle ---------------------------------------------------------
        h = self._res("middle_block_0", None)(h, emb, ioi, t)
        h = self._attn("middle_block_1", ch, depth_middle)(
            h, context, time_context, t, ioi
        )
        h = self._res("middle_block_2", None)(h, emb, ioi, t)

        # --- output blocks --------------------------------------------------
        block_idx = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = input_block_chans.pop()
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = self._res(f"output_blocks_{block_idx}_0", mc * mult)(
                    h, emb, ioi, t
                )
                ch = mc * mult
                layer_idx = 1
                if ds in self.attention_resolutions:
                    h = self._attn(
                        f"output_blocks_{block_idx}_{layer_idx}", ch, depths[level]
                    )(h, context, time_context, t, ioi)
                    layer_idx += 1
                if level and i == self.num_res_blocks:
                    ds //= 2
                    if self.resblock_updown:
                        h = self._res(
                            f"output_blocks_{block_idx}_{layer_idx}", ch, up=True
                        )(h, emb, ioi, t)
                    else:
                        h = Upsample(
                            out_channels=ch, use_conv=self.conv_resample,
                            dtype=self.dtype,
                            name=f"output_blocks_{block_idx}_{layer_idx}",
                        )(h)
                block_idx += 1

        # --- out head -------------------------------------------------------
        h = GroupNorm32(silu=True, name="out_0")(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.zeros, dtype=self.dtype, name="out_2",
        )(h)
        return h
