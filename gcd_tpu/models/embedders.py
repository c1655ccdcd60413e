"""Conditioner + embedders (reference: gcd-model/sgm/modules/encoders/modules.py).

GeneralConditioner (:84) runs every embedder over the batch and routes each
output by rank into the cond dict:
    rank 2 -> "vector"   (concatenated on the feature axis)
    rank 3 -> "crossattn"(token axis kept, concat on features)
    rank 4 -> "concat"   (channel axis — last in NHWC)
GCD ordering contract: the camera embedder (Camera/Spherical) must be *last* so
its 128-d output occupies the tail of `vector`, which VideoUNet routes into
`aux_label_emb` (video_model.py:494-497, train_kubric_max90.yaml:115-121).

Everything is one flax module so conditioner params form a single tree; frozen
embedders (CLIP tower, VAE encoder) are wrapped in stop_gradient, mirroring the
reference's torch.no_grad embedding contexts (modules.py:142-150).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcd_tpu.models.clip import CLIPVisionTower, clip_preprocess
from gcd_tpu.models.vae import Encoder as VAEEncoder
from gcd_tpu.ops.basic import timestep_embedding
from gcd_tpu.utils.config import register, get_obj_from_str
from gcd_tpu.utils.misc import expand_dims_like

Dtype = Any

COND_KEYS_BY_NDIM = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}


@register("sgm.modules.encoders.modules.FrozenOpenCLIPImageEmbedder")
class FrozenOpenCLIPImageEmbedder(nn.Module):
    """CLIP ViT-H/14 image embedding (modules.py:653-726). (N,H,W,3)->(N,1024)."""

    arch: str = "ViT-H-14"
    version: str = "laion2b_s32b_b79k"
    device: str = "tpu"
    max_length: int = 77
    freeze: bool = True
    antialias: bool = True
    ucg_rate: float = 0.0
    unsqueeze_dim: bool = False
    repeat_to_max_len: bool = False
    num_image_crops: int = 0
    output_tokens: bool = False
    init_device: Optional[str] = None
    dtype: Dtype = jnp.float32
    # Tower-architecture overrides (defaults = ViT-H/14; shrunk in unit tests).
    clip_width: int = 1280
    clip_layers: int = 32
    clip_heads: int = 16
    clip_patch_size: int = 14
    clip_image_size: int = 224
    clip_output_dim: int = 1024

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        x = clip_preprocess(image, image_size=self.clip_image_size)
        return CLIPVisionTower(
            width=self.clip_width,
            layers=self.clip_layers,
            heads=self.clip_heads,
            patch_size=self.clip_patch_size,
            image_size=self.clip_image_size,
            output_dim=self.clip_output_dim,
            dtype=self.dtype,
            name="visual",
        )(x)


@register("sgm.modules.encoders.modules.FrozenOpenCLIPImagePredictionEmbedder")
class FrozenOpenCLIPImagePredictionEmbedder(nn.Module):
    """(B*T, H, W, 3) -> (B*T/n_cond_frames*n_copies, n_cond_frames, 1024)
    crossattn tokens (modules.py:1117-1136)."""

    open_clip_embedding_config: Dict = None
    n_cond_frames: int = 1
    n_copies: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vid: jnp.ndarray) -> jnp.ndarray:
        params = dict((self.open_clip_embedding_config or {}).get("params", {}))
        params.pop("freeze", None)
        z = FrozenOpenCLIPImageEmbedder(
            dtype=self.dtype, name="open_clip", **params
        )(vid)
        t = self.n_cond_frames
        b = z.shape[0] // t
        z = z.reshape(b, t, z.shape[-1])
        return jnp.repeat(z, self.n_copies, axis=0)


@register("sgm.modules.encoders.modules.ConcatTimestepEmbedderND")
class ConcatTimestepEmbedderND(nn.Module):
    """Sinusoidal embedding of each scalar dim, concatenated (modules.py:1000-1017)."""

    outdim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 1:
            x = x[:, None]
        assert x.ndim == 2
        b, dims = x.shape
        emb = timestep_embedding(x.reshape(-1).astype(jnp.float32), self.outdim)
        return emb.reshape(b, dims * self.outdim)


@register("sgm.modules.encoders.modules.VideoPredictionEmbedderWithEncoder")
class VideoPredictionEmbedderWithEncoder(nn.Module):
    """VAE-encodes the (noised) conditioning frames into 4ch concat latents
    (modules.py:1038-1114). GCD config: is_ae=True, mode-only posterior, no
    internal sigma sampler (cond_aug noise is added by the data pipeline)."""

    encoder_config: Dict = None
    n_cond_frames: int = 1
    n_copies: int = 1
    is_ae: bool = False
    scale_factor: float = 1.0
    disable_encoder_autocast: bool = False
    en_and_decode_n_samples_a_time: Optional[int] = None
    sigma_sampler_config: Optional[Dict] = None
    sigma_cond_config: Optional[Dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vid: jnp.ndarray) -> jnp.ndarray:
        assert self.sigma_sampler_config is None, (
            "GCD adds cond_aug noise in the data pipeline, not here"
        )
        cfg = self.encoder_config or {}
        target = cfg.get("target", "")
        params = cfg.get("params", {})
        assert "AutoencoderKL" in target, f"unsupported encoder {target}"
        dd = dict(params["ddconfig"])
        dd.pop("lossconfig", None)
        embed_dim = int(params.get("embed_dim", 4))
        double_z = bool(dd.get("double_z", True))

        class _Inner(nn.Module):
            dtype: Any = jnp.float32

            @nn.compact
            def __call__(self, x):
                moments = VAEEncoder(
                    **{k: v for k, v in dd.items() if k != "attn_type"},
                    dtype=self.dtype, name="encoder",
                )(x)
                mult = 2 if double_z else 1
                moments = nn.Conv(mult * embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")(moments)
                mean, _ = jnp.split(moments, 2, axis=-1)
                return mean  # mode-only posterior (AutoencoderKLModeOnly)

        z = _Inner(dtype=self.dtype, name="encoder")(vid)
        z = z * self.scale_factor
        # (b t) h w c -> b (t c on channel) h w -> repeat n_copies
        t = self.n_cond_frames
        b = z.shape[0] // t
        h, w, c = z.shape[1:]
        z = z.reshape(b, t, h, w, c).transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
        return jnp.repeat(z, self.n_copies, axis=0)


@register("sgm.modules.encoders.modules.CameraEmbedder")
class CameraEmbedder(nn.Module):
    """Linear(12 -> embed_dim) over the flattened 3x4 relative pose
    (modules.py:231-245) — 6-DoF camera control."""

    embed_dim: int = 128
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-2:] == (3, 4)
        x = x.reshape(x.shape[:-2] + (12,))
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(self.embed_dim, kernel_init=init, dtype=self.dtype,
                        name="proj")(x.astype(self.dtype))


@register("sgm.modules.encoders.modules.SphericalEmbedder")
class SphericalEmbedder(nn.Module):
    """Fourier features of (d-azimuth, d-elevation) + raw d-radius -> Linear(13)
    (modules.py:247-287) — spherical camera control."""

    embed_dim: int = 128
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-1] == 3
        azimuth, elevation, radius = x[..., 0], x[..., 1], x[..., 2]

        def fourier(v):
            return jnp.stack(
                [jnp.cos(v), jnp.sin(v),
                 jnp.cos(v * 2.0), jnp.sin(v * 2.0),
                 jnp.cos(v * 4.0), jnp.sin(v * 4.0)], axis=-1)

        x_emb = jnp.concatenate(
            [fourier(azimuth), fourier(elevation), radius[..., None]], axis=-1
        )
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(self.embed_dim, kernel_init=init, dtype=self.dtype,
                        name="proj")(x_emb.astype(self.dtype))


@register("sgm.modules.encoders.modules.IdentityEncoder")
class IdentityEncoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


@register("sgm.modules.GeneralConditioner",
          "sgm.modules.encoders.modules.GeneralConditioner")
class GeneralConditioner(nn.Module):
    """Runs all embedders and assembles {vector, crossattn, concat}
    (modules.py:84-208)."""

    emb_models: Sequence[Dict] = ()
    dtype: Dtype = jnp.float32

    def setup(self):
        mods = []
        meta = []
        for cfg in self.emb_models:
            cls = get_obj_from_str(cfg["target"])
            params = dict(cfg.get("params", {}) or {})
            mods.append(cls(**params, dtype=self.dtype)
                        if "dtype" in cls.__dataclass_fields__ else cls(**params))
            meta.append(
                dict(
                    input_key=cfg.get("input_key"),
                    ucg_rate=float(cfg.get("ucg_rate", 0.0)),
                    is_trainable=bool(cfg.get("is_trainable", False)),
                )
            )
        self.embedders = mods
        self.embedder_meta = tuple(
            (m["input_key"], m["ucg_rate"], m["is_trainable"]) for m in meta
        )

    def __call__(
        self,
        batch: Dict,
        force_zero_embeddings: Optional[List[str]] = None,
        train: bool = False,
    ) -> Dict:
        force_zero_embeddings = force_zero_embeddings or []
        output: Dict[str, jnp.ndarray] = {}

        for embedder, (input_key, ucg_rate, is_trainable) in zip(
            self.embedders, self.embedder_meta
        ):
            emb_out = embedder(batch[input_key])
            if not is_trainable:
                emb_out = jax.lax.stop_gradient(emb_out)
            if not isinstance(emb_out, (list, tuple)):
                emb_out = [emb_out]
            for emb in emb_out:
                out_key = COND_KEYS_BY_NDIM[emb.ndim]
                if ucg_rate > 0.0 and train:
                    # Per-frame Bernoulli zeroing (modules.py:161-169).
                    keep = jax.random.bernoulli(
                        self.make_rng("ucg"), 1.0 - ucg_rate, (emb.shape[0],)
                    ).astype(emb.dtype)
                    emb = expand_dims_like(keep, emb) * emb
                if input_key in force_zero_embeddings:
                    emb = jnp.zeros_like(emb)
                if out_key in output:
                    output[out_key] = jnp.concatenate(
                        [output[out_key], emb], axis=-1
                    )
                else:
                    output[out_key] = emb
        return output

    def get_unconditional_conditioning(
        self,
        batch_c: Dict,
        batch_uc: Optional[Dict] = None,
        force_uc_zero_embeddings: Optional[List[str]] = None,
        force_cond_zero_embeddings: Optional[List[str]] = None,
    ) -> Tuple[Dict, Dict]:
        c = self(batch_c, force_cond_zero_embeddings, train=False)
        uc = self(
            batch_c if batch_uc is None else batch_uc,
            force_uc_zero_embeddings,
            train=False,
        )
        return c, uc


# ---------------------------------------------------------------------------
# Additional embedders present in the reference but unused by GCD configs
# (SURVEY.md section 2.1 "Other embedders"). Implemented for API completeness.
# ---------------------------------------------------------------------------


@register("sgm.modules.encoders.modules.ClassEmbedder")
class ClassEmbedder(nn.Module):
    """Class-id embedding table (modules.py:298-318)."""

    embed_dim: int
    n_classes: int = 1000
    add_sequence_dim: bool = False

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.n_classes, self.embed_dim, name="embedding")(
            c.astype(jnp.int32)
        )
        if self.add_sequence_dim:
            emb = emb[:, None, :]
        return emb

    def get_unconditional_conditioning_value(self):
        return self.n_classes - 1


@register("sgm.modules.encoders.modules.SpatialRescaler")
class SpatialRescaler(nn.Module):
    """Multi-stage rescaler with optional channel remap (modules.py:846-903);
    NHWC."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    in_channels: int = 3
    out_channels: Optional[int] = None
    bias: bool = False
    wrap_video: bool = False
    kernel_size: int = 1
    remap_output: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        method = {"bilinear": "linear", "trilinear": "linear",
                  "area": "linear"}.get(self.method, self.method)
        b_t_shape = None
        if self.wrap_video and x.ndim == 5:
            b, t = x.shape[:2]
            b_t_shape = (b, t)
            x = x.reshape((b * t,) + x.shape[2:])
        for _ in range(self.n_stages):
            n, h, w, c = x.shape
            x = jax.image.resize(
                x, (n, int(h * self.multiplier), int(w * self.multiplier), c),
                method=method)
        if self.out_channels is not None or self.remap_output:
            pad = self.kernel_size // 2
            x = nn.Conv(self.out_channels or x.shape[-1],
                        (self.kernel_size, self.kernel_size),
                        padding=((pad, pad), (pad, pad)),
                        use_bias=self.bias, name="channel_mapper")(x)
        if b_t_shape is not None:
            x = x.reshape(b_t_shape + x.shape[1:])
        return x


@register("sgm.modules.encoders.modules.GaussianEncoder")
class GaussianEncoder(nn.Module):
    """VAE encoder + sampled diagonal-gaussian posterior (modules.py:1019-1036)."""

    weight: float = 1.0
    flatten_output: bool = True
    ddconfig: Optional[Dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from gcd_tpu.models.vae import Encoder as VAEEnc

        dd = {k: v for k, v in (self.ddconfig or {}).items()
              if k not in ("attn_type", "lossconfig")}
        moments = VAEEnc(**dd, dtype=self.dtype, name="encoder")(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jax.random.normal(
            self.make_rng("gaussian"), mean.shape, dtype=mean.dtype)
        if self.flatten_output:
            n, h, w, c = z.shape
            z = z.reshape(n, h * w, c)
        return z


class _UnavailableTextEmbedder(nn.Module):
    """Text towers (T5/CLIP-text) — present in the reference but unused by any
    GCD config (SURVEY.md section 2.1); their pretrained weights are not
    shipped in this environment. Instantiation succeeds (config parity);
    calling raises with a clear message."""

    version: str = ""
    device: str = "tpu"
    max_length: int = 77
    freeze: bool = True
    layer: str = "last"
    layer_idx: Optional[int] = None
    always_return_pooled: bool = False
    legacy: bool = True

    def __call__(self, text):
        raise NotImplementedError(
            f"{type(self).__name__} is not used by any GCD config and its "
            "pretrained text-tower weights are unavailable in this "
            "environment. Wire a converted checkpoint through "
            "gcd_tpu.io.convert and implement the tower (see models/clip.py "
            "for the vision-tower pattern) if a config needs it."
        )


@register("sgm.modules.encoders.modules.FrozenT5Embedder")
class FrozenT5Embedder(_UnavailableTextEmbedder):
    pass


@register("sgm.modules.encoders.modules.FrozenByT5Embedder")
class FrozenByT5Embedder(_UnavailableTextEmbedder):
    pass


@register("sgm.modules.encoders.modules.FrozenCLIPEmbedder")
class FrozenCLIPEmbedder(_UnavailableTextEmbedder):
    pass


@register("sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder")
class FrozenOpenCLIPEmbedder(_UnavailableTextEmbedder):
    pass


@register("sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder2")
class FrozenOpenCLIPEmbedder2(_UnavailableTextEmbedder):
    pass
