"""KL video VAE: SD-style image Encoder + SVD temporal VideoDecoder.

Behavioral reference:
  * Encoder/Decoder/ResnetBlock/AttnBlock — gcd-model/sgm/modules/diffusionmodules/model.py
    (Encoder :487, Decoder :604, ResnetBlock :93, AttnBlock :161; GroupNorm eps 1e-6)
  * VideoDecoder (time_mode="conv-only") — sgm/modules/autoencoding/temporal_ae.py:293:
    every decoder ResnetBlock gains a temporal `time_stack` (3D conv ResBlock,
    skip_t_emb, GroupNorm eps 1e-5) with a per-block learned scalar alpha that
    weights the *temporal* branch, and conv_out becomes AE3DConv (2D conv + 3D
    time-mix conv).
  * Engines — sgm/models/autoencoder.py (AutoencodingEngine :121 — no quant convs;
    AutoencodingEngineLegacy :459 / AutoencoderKL :533 / AutoencoderKLModeOnly :627 —
    with quant/post_quant convs).

Layout: NHWC; the decoder receives `timesteps` (chunk T) for its temporal convs,
matching the reference's chunked-decode `decoding_t` contract (diffusion.py:233-251).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcd_tpu.models.layers import LayerNormFp32
from gcd_tpu.models.video_attention import VideoTransformerBlock
from gcd_tpu.ops.attention import dot_product_attention
from gcd_tpu.ops.basic import nearest_upsample_2x, timestep_embedding
from gcd_tpu.utils.config import register, instantiate_from_config

Dtype = Any


class VAEGroupNorm(nn.Module):
    """GroupNorm(32, eps=1e-6) in fp32 (model.py Normalize :52). Uses the
    MXU-statistics formulation (ops/fused_norm) so the stats reduce is not
    fused into the producing conv — same param tree as nn.GroupNorm."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        from gcd_tpu.models.layers import _NormParams
        from gcd_tpu.ops.fused_norm import group_norm_silu

        scale, bias = _NormParams(x.shape[-1], name="norm")()
        return group_norm_silu(x, scale, bias, 32, self.epsilon, False)


class ResnetBlock(nn.Module):
    """norm-swish-conv x2 + 1x1 skip (model.py:93-151). temb unused in AE."""

    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        out_ch = self.out_channels or c
        h = VAEGroupNorm(name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(h)
        h = VAEGroupNorm(name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(h)
        if out_ch != c:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial tokens, 1x1-conv projections
    (model.py:161-199)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def attention(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        hn = VAEGroupNorm(name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn)
        q = q.reshape(n, h * w, 1, c)
        k = k.reshape(n, h * w, 1, c)
        v = v.reshape(n, h * w, 1, c)
        out = dot_product_attention(q, k, v)
        return out.reshape(n, h, w, c)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.attention(x)
        h = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class Downsample(nn.Module):
    """Asymmetric-pad (0,1,0,1) stride-2 conv (model.py:75-91)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        return nn.Conv(c, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """2x nearest + 3x3 conv (model.py:58-72)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from gcd_tpu.models.layers import _ConvParams
        from gcd_tpu.ops.dispatch import kernel_enabled
        from gcd_tpu.ops.subpixel import upsample2x_conv3x3

        c = x.shape[-1]
        kernel, bias = _ConvParams(c, name="conv")(c)
        if kernel_enabled("subpix_upsample"):
            return upsample2x_conv3x3(x, kernel, bias, dtype=self.dtype)
        x = nearest_upsample_2x(x)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)


@register("sgm.modules.diffusionmodules.model.Encoder")
class Encoder(nn.Module):
    """f8 image encoder (model.py:487-600). Input (N, H, W, 3) in [-1, 1];
    output (N, H/8, W/8, 2*z_channels) moments when double_z."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    z_channels: int = 4
    double_z: bool = True
    in_channels: int = 3
    out_ch: int = 3
    resolution: int = 256
    dropout: float = 0.0
    attn_type: str = "vanilla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        curr_res = self.resolution
        h = nn.Conv(self.ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(x)
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    out_channels=self.ch * mult, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        h = ResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dtype=self.dtype, name="mid_block_2")(h)

        h = VAEGroupNorm(name="norm_out")(h)
        h = nn.silu(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv_out")(h)


class TemporalResStack(nn.Module):
    """Temporal 3D-conv ResBlock used as `time_stack` in the VideoDecoder's
    VideoResBlock (temporal_ae.py:33-45): openaimodel.ResBlock with
    skip_t_emb=True, kernel [3,1,1], GroupNorm eps 1e-5. Input (B, T, H, W, C)."""

    kernel_size: Sequence[int] = (3, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from gcd_tpu.models.layers import _NormParams
        from gcd_tpu.ops.fused_norm import group_norm_silu

        ks = tuple(self.kernel_size)
        pad = tuple((k // 2, k // 2) for k in ks)
        c = x.shape[-1]

        def conv(name, zero_init=False):
            if len(ks) == 3 and ks[1:] == (1, 1):
                from gcd_tpu.ops.temporal_conv import TemporalConvK11

                return TemporalConvK11(features=c, kt=ks[0],
                                       zero_init=zero_init, dtype=self.dtype,
                                       name=name)
            kinit = (nn.initializers.zeros if zero_init
                     else nn.initializers.lecun_normal())
            return nn.Conv(c, ks, padding=pad, kernel_init=kinit,
                           dtype=self.dtype, name=name)

        s0, b0 = _NormParams(c, name="in_layers_0")()
        h = group_norm_silu(x, s0, b0, 32, 1e-5, True)
        h = conv("in_layers_2")(h)
        # skip_t_emb: emb_out treated as zeros (openaimodel.py:335-336)
        s1, b1 = _NormParams(c, name="out_layers_0")()
        h = group_norm_silu(h, s1, b1, 32, 1e-5, True)
        h = conv("out_layers_3", zero_init=True)(h)
        return x + h


class DecoderVideoResBlock(nn.Module):
    """Spatial ResnetBlock + temporal time_stack with learned scalar alpha
    weighting the *temporal* branch (temporal_ae.py:18-85)."""

    out_channels: Optional[int] = None
    video_kernel_size: Sequence[int] = (3, 1, 1)
    alpha: float = 0.0
    merge_strategy: str = "learned"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: int) -> jnp.ndarray:
        x = ResnetBlock(out_channels=self.out_channels, dtype=self.dtype,
                        name="spatial")(x)
        t = timesteps
        bt, h, w, c = x.shape
        b = bt // t
        x_vid = x.reshape(b, t, h, w, c)
        x_mix = x_vid
        x_vid = TemporalResStack(kernel_size=self.video_kernel_size,
                                 dtype=self.dtype, name="time_stack")(x_vid)
        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.alpha, dtype=jnp.float32)
        else:
            mix = self.param("mix_factor",
                             lambda k: jnp.full((1,), self.alpha, jnp.float32))
            alpha = jax.nn.sigmoid(mix)[0]
        alpha = alpha.astype(x.dtype)
        out = alpha * x_vid + (1.0 - alpha) * x_mix
        return out.reshape(bt, h, w, c)


class VideoAttnBlock(nn.Module):
    """Spatio-temporal attention block for the VideoDecoder's attn/"all" time
    modes: the reference's VideoBlock / MemoryEfficientVideoBlock
    (temporal_ae.py:110-178 / :180-245 — numerically identical, they differ
    only in the torch attention backend). Spatial single-head attention (the
    AttnBlock core), then a parallel temporal branch: learned frame-position
    embedding + single-head temporal transformer (ff_in=True, no context), and
    an alpha merge where alpha weights the *spatial* branch, followed by
    proj_out and the outer residual."""

    alpha: float = 0.0
    merge_strategy: str = "learned"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: int) -> jnp.ndarray:
        t = timesteps
        bt, hh, ww, c = x.shape
        x_in = x

        hn = VAEGroupNorm(name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn)
        h = dot_product_attention(
            q.reshape(bt, hh * ww, 1, c),
            k.reshape(bt, hh * ww, 1, c),
            v.reshape(bt, hh * ww, 1, c),
        ).reshape(bt, hh * ww, c)

        # Frame-position embedding added to the temporal branch only
        # (temporal_ae.py:151-157): sinusoidal embed of the frame index
        # through a Linear-SiLU-Linear MLP.
        frame_idx = jnp.tile(jnp.arange(t, dtype=jnp.float32), bt // t)
        temb = timestep_embedding(frame_idx, c)
        emb = nn.Dense(4 * c, dtype=self.dtype, name="video_time_embed_0")(temb)
        emb = nn.Dense(c, dtype=self.dtype,
                       name="video_time_embed_2")(nn.silu(emb))
        x_mix = h + emb[:, None, :].astype(h.dtype)

        x_mix = VideoTransformerBlock(
            n_heads=1, d_head=c, ff_in=True, dtype=self.dtype,
            name="time_mix_block",
        )(x_mix, timesteps=t)

        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.alpha, dtype=jnp.float32)
        elif self.merge_strategy == "learned":
            mix = self.param("mix_factor",
                             lambda _: jnp.full((1,), self.alpha, jnp.float32))
            alpha = jax.nn.sigmoid(mix)[0]
        else:
            raise ValueError(f"unknown merge strategy {self.merge_strategy}")
        alpha = alpha.astype(h.dtype)
        h = alpha * h + (1.0 - alpha) * x_mix

        h = h.reshape(bt, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x_in + h


class AE3DConvOut(nn.Module):
    """2D conv + temporal mix conv for the decoder output (temporal_ae.py:86-107)."""

    out_channels: int
    video_kernel_size: Sequence[int] = (3, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: int) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2d")(x)
        t = timesteps
        bt, h, w, c = x.shape
        ks = tuple(self.video_kernel_size)
        pad = tuple((k // 2, k // 2) for k in ks)
        x = x.reshape(bt // t, t, h, w, c)
        if len(ks) == 3 and ks[1:] == (1, 1):
            from gcd_tpu.ops.temporal_conv import TemporalConvK11

            x = TemporalConvK11(features=self.out_channels, kt=ks[0],
                                dtype=self.dtype, name="time_mix_conv")(x)
        else:
            x = nn.Conv(self.out_channels, ks, padding=pad, dtype=self.dtype,
                        name="time_mix_conv")(x)
        return x.reshape(bt, h, w, c)


@register("sgm.modules.diffusionmodules.model.Decoder")
class Decoder(nn.Module):
    """Plain SD image decoder (model.py:604-747)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    z_channels: int = 4
    double_z: bool = True
    in_channels: int = 3
    out_ch: int = 3
    resolution: int = 256
    dropout: float = 0.0
    attn_type: str = "vanilla"
    give_pre_end: bool = False
    tanh_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, **kwargs) -> jnp.ndarray:
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_res - 1)

        h = nn.Conv(block_in, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dtype=self.dtype, name="mid_block_2")(h)

        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(out_channels=block_out, dtype=self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = VAEGroupNorm(name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


@register("sgm.modules.autoencoding.temporal_ae.VideoDecoder")
class VideoDecoder(nn.Module):
    """SVD temporal decoder (temporal_ae.py:293-349).

    `timesteps` is the number of frames decoded together (the reference's
    `decoding_t` chunk size); it must divide the batch.

    time_mode selects which components get temporal branches
    (temporal_ae.py:294,324-349):
      * "conv-only" (the GCD/SVD default): VideoResBlocks + AE3DConv out,
        plain spatial attention;
      * "attn-only": plain ResnetBlocks + plain conv out, VideoAttnBlocks;
      * "all": VideoResBlocks + AE3DConv out + VideoAttnBlocks."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    z_channels: int = 4
    double_z: bool = True
    in_channels: int = 3
    out_ch: int = 3
    resolution: int = 256
    dropout: float = 0.0
    attn_type: str = "vanilla"
    video_kernel_size: Union[int, Sequence[int]] = 3
    alpha: float = 0.0
    merge_strategy: str = "learned"
    time_mode: str = "conv-only"
    give_pre_end: bool = False
    tanh_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, timesteps: Optional[int] = None) -> jnp.ndarray:
        assert self.time_mode in ("all", "conv-only", "attn-only"), (
            f"time_mode must be one of all/conv-only/attn-only, got "
            f"{self.time_mode!r}")
        vks = self.video_kernel_size
        if isinstance(vks, int):
            vks = (vks, vks, vks)
        vks = tuple(vks)
        if timesteps is None:
            timesteps = z.shape[0]

        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_res - 1)

        video_res = self.time_mode != "attn-only"
        video_attn = self.time_mode != "conv-only"

        def res(name, out_ch=None):
            if not video_res:
                blk = ResnetBlock(out_channels=out_ch, dtype=self.dtype,
                                  name=name)
                return lambda x, _t: blk(x)
            blk = DecoderVideoResBlock(
                out_channels=out_ch, video_kernel_size=vks, alpha=self.alpha,
                merge_strategy=self.merge_strategy, dtype=self.dtype, name=name,
            )
            return blk

        def attn(name):
            if not video_attn:
                blk = AttnBlock(dtype=self.dtype, name=name)
                return lambda x, _t: blk(x)
            return VideoAttnBlock(alpha=self.alpha,
                                  merge_strategy=self.merge_strategy,
                                  dtype=self.dtype, name=name)

        h = nn.Conv(block_in, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(z)
        h = res("mid_block_1")(h, timesteps)
        h = attn("mid_attn_1")(h, timesteps)
        h = res("mid_block_2")(h, timesteps)

        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = res(f"up_{i_level}_block_{i_block}", block_out)(h, timesteps)
                if curr_res in self.attn_resolutions:
                    h = attn(f"up_{i_level}_attn_{i_block}")(h, timesteps)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = VAEGroupNorm(name="norm_out")(h)
        h = nn.silu(h)
        if self.time_mode == "attn-only":
            h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="conv_out")(h)
        else:
            h = AE3DConvOut(self.out_ch, video_kernel_size=vks,
                            dtype=self.dtype, name="conv_out")(h, timesteps)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


# ---------------------------------------------------------------------------
# Distributions / regularizers
# ---------------------------------------------------------------------------


class DiagonalGaussianDistribution:
    """(reference: sgm/modules/distributions/distributions.py:95)."""

    def __init__(self, moments: jnp.ndarray):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            self.mean**2 + self.var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


@register("sgm.modules.autoencoding.regularizers.DiagonalGaussianRegularizer")
class DiagonalGaussianRegularizer:
    def __init__(self, sample: bool = True):
        self.sample = sample

    def __call__(self, z: jnp.ndarray, key: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, Dict]:
        posterior = DiagonalGaussianDistribution(z)
        if self.sample:
            assert key is not None, "sampling regularizer needs a PRNG key"
            out = posterior.sample(key)
        else:
            out = posterior.mode()
        return out, {"kl_loss": posterior.kl()}


# ---------------------------------------------------------------------------
# Engines (functional: hold module defs; params supplied by the caller)
# ---------------------------------------------------------------------------


@register("sgm.models.autoencoder.AutoencodingEngine")
class AutoencodingEngine:
    """First-stage VAE wrapper (autoencoder.py:121). No quant convs."""

    def __init__(self, encoder_config: Dict, decoder_config: Dict,
                 regularizer_config: Dict, loss_config: Dict = None, **kwargs):
        self.encoder = instantiate_from_config(encoder_config)
        self.decoder = instantiate_from_config(decoder_config)
        self.regularization = instantiate_from_config(regularizer_config)

    def init(self, key, img_hw=(64, 64), t: int = 2):
        h, w = img_hw
        k1, k2, k3 = jax.random.split(key, 3)
        enc_params = self.encoder.init(k1, jnp.zeros((1, h, w, 3)))
        z_ch = self.encoder.z_channels
        dec_kwargs = {}
        if isinstance(self.decoder, VideoDecoder):
            dec_kwargs = {"timesteps": t}
        dec_params = self.decoder.init(
            k2, jnp.zeros((t, h // 8, w // 8, z_ch)), **dec_kwargs
        )
        out = {"encoder": enc_params["params"], "decoder": dec_params["params"]}
        if isinstance(self.regularization, nn.Module):
            # parameterized regularizer (VQ codebooks, quantize.py:172-302)
            mo_ch = 2 * z_ch if getattr(self.encoder, "double_z", False) else z_ch
            out["regularization"] = self.regularization.init(
                k3, jnp.zeros((1, h // 8, w // 8, mo_ch)))
        return out

    def _regularize(self, params, moments, key):
        if isinstance(self.regularization, nn.Module):
            return self.regularization.apply(params["regularization"], moments)
        return self.regularization(moments, key=key)

    def encode(self, params, x: jnp.ndarray, key: Optional[jax.Array] = None,
               sample_posterior: Optional[bool] = None) -> jnp.ndarray:
        moments = self.encoder.apply({"params": params["encoder"]}, x)
        z, _ = self._regularize(params, moments, key)
        return z

    def encode_moments(self, params, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder.apply({"params": params["encoder"]}, x)

    def decode(self, params, z: jnp.ndarray, timesteps: Optional[int] = None
               ) -> jnp.ndarray:
        kwargs = {}
        if isinstance(self.decoder, VideoDecoder):
            kwargs["timesteps"] = timesteps if timesteps is not None else z.shape[0]
        return self.decoder.apply({"params": params["decoder"]}, z, **kwargs)


@register("sgm.models.autoencoder.AutoencodingEngineLegacy")
class AutoencodingEngineLegacy(AutoencodingEngine):
    """Adds quant/post_quant 1x1 convs (autoencoder.py:459-531)."""

    def __init__(self, embed_dim: int, ddconfig: Dict = None,
                 regularizer_config: Dict = None, max_batch_size: Optional[int] = None,
                 **kwargs):
        ddconfig = dict(ddconfig or {})
        enc_cfg = {"target": "sgm.modules.diffusionmodules.model.Encoder",
                   "params": {k: v for k, v in ddconfig.items() if k != "lossconfig"}}
        dec_cfg = {"target": "sgm.modules.diffusionmodules.model.Decoder",
                   "params": {k: v for k, v in ddconfig.items() if k != "lossconfig"}}
        reg_cfg = regularizer_config or {
            "target": "sgm.modules.autoencoding.regularizers.DiagonalGaussianRegularizer"
        }
        super().__init__(enc_cfg, dec_cfg, reg_cfg)
        self.embed_dim = int(embed_dim)
        self.double_z = bool(ddconfig.get("double_z", True))
        self.z_channels = int(ddconfig.get("z_channels", 4))
        self.max_batch_size = max_batch_size

    def init(self, key, img_hw=(64, 64), t: int = 2):
        params = super().init(key, img_hw, t)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
        mult = 2 if self.double_z else 1
        quant = nn.Conv(mult * self.embed_dim, (1, 1))
        post = nn.Conv(self.z_channels, (1, 1))
        params["quant_conv"] = quant.init(
            k1, jnp.zeros((1, 8, 8, mult * self.z_channels)))["params"]
        params["post_quant_conv"] = post.init(
            k2, jnp.zeros((1, 8, 8, self.embed_dim)))["params"]
        return params

    def encode(self, params, x: jnp.ndarray, key: Optional[jax.Array] = None,
               sample_posterior: Optional[bool] = None) -> jnp.ndarray:
        moments = self.encoder.apply({"params": params["encoder"]}, x)
        mult = 2 if self.double_z else 1
        quant = nn.Conv(mult * self.embed_dim, (1, 1))
        moments = quant.apply({"params": params["quant_conv"]}, moments)
        z, _ = self._regularize(params, moments, key)
        return z

    def decode(self, params, z: jnp.ndarray, timesteps: Optional[int] = None
               ) -> jnp.ndarray:
        post = nn.Conv(self.z_channels, (1, 1))
        z = post.apply({"params": params["post_quant_conv"]}, z)
        return super().decode(params, z, timesteps)


@register("sgm.models.autoencoder.AutoencoderKL")
class AutoencoderKL(AutoencodingEngineLegacy):
    def __init__(self, **kwargs):
        kwargs.pop("lossconfig", None)
        kwargs.setdefault(
            "regularizer_config",
            {"target": "sgm.modules.autoencoding.regularizers.DiagonalGaussianRegularizer"},
        )
        super().__init__(**kwargs)


@register("sgm.models.autoencoder.AutoencoderKLModeOnly")
class AutoencoderKLModeOnly(AutoencodingEngineLegacy):
    def __init__(self, **kwargs):
        kwargs.pop("lossconfig", None)
        kwargs.pop("monitor", None)
        kwargs["regularizer_config"] = {
            "target": "sgm.modules.autoencoding.regularizers.DiagonalGaussianRegularizer",
            "params": {"sample": False},
        }
        super().__init__(**kwargs)


@register("sgm.models.autoencoder.IdentityFirstStage")
class IdentityFirstStage:
    def __init__(self, *args, **kwargs):
        pass

    def init(self, key, **kwargs):
        return {}

    def encode(self, params, x, key=None, **kwargs):
        return x

    def decode(self, params, z, **kwargs):
        return z
