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
        # Fail loudly on config features this tower does not implement —
        # silently ignoring output_tokens would route a pooled (N,1024)
        # vector where the reference conditions crossattn on a token grid
        # (modules.py:718-724), and a per-embedder ucg_rate/unsqueeze/repeat
        # would be swallowed without any dropout/reshape applied. All GCD/SVD
        # configs use the defaults.
        assert not self.output_tokens, "output_tokens=True not implemented"
        assert not self.unsqueeze_dim, "unsqueeze_dim=True not implemented"
        assert not self.repeat_to_max_len, "repeat_to_max_len not implemented"
        assert self.num_image_crops == 0, "num_image_crops not implemented"
        assert self.ucg_rate == 0.0, (
            "per-embedder ucg_rate not implemented here; use the "
            "GeneralConditioner-level ucg_rate (embedders.py routing)")
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


# ---------------------------------------------------------------------------
# Text embedders (modules.py:332-651). Unused by every GCD config, but part of
# the sgm API surface. Each accepts either an int token array (B, S) — the
# jit-friendly path — or a list of strings, tokenized on the host when the
# needed tokenizer assets are available locally (this environment has no
# network egress, so BPE/sentencepiece vocab downloads are impossible; ByT5 is
# asset-free).
# ---------------------------------------------------------------------------

# (d_model, d_ff, num_layers, num_heads, d_kv, vocab, gated_ff)
_T5_ARCHS = {
    "google/t5-v1_1-small": (512, 1024, 8, 6, 64, 32128, True),
    "google/t5-v1_1-base": (768, 2048, 12, 12, 64, 32128, True),
    "google/t5-v1_1-large": (1024, 2816, 24, 16, 64, 32128, True),
    "google/t5-v1_1-xl": (2048, 5120, 24, 32, 64, 32128, True),
    "google/t5-v1_1-xxl": (4096, 10240, 24, 64, 64, 32128, True),
    "google/byt5-small": (1472, 3584, 12, 6, 64, 384, True),
    "google/byt5-base": (1536, 3968, 18, 12, 64, 384, True),
    "google/byt5-large": (1536, 3840, 36, 16, 64, 384, True),
}

# (width, layers, heads, output_dim, quick_gelu)
_CLIP_TEXT_ARCHS = {
    "openai/clip-vit-large-patch14": (768, 12, 12, None, True),
    "openai/clip-vit-base-patch32": (512, 12, 8, None, True),
    "ViT-L-14": (768, 12, 12, 768, False),
    "ViT-H-14": (1024, 24, 16, 1024, False),
    "ViT-bigG-14": (1280, 32, 20, 1280, False),
}


def _tokenize_hf(texts: Sequence[str], name_or_path: str, cls: str,
                 max_length: int) -> jnp.ndarray:
    """Host tokenization via a *local* HF tokenizer (no downloads)."""
    try:
        import transformers

        tok = getattr(transformers, cls).from_pretrained(
            name_or_path, local_files_only=True
        )
    except Exception as e:
        raise RuntimeError(
            f"{cls} assets for '{name_or_path}' are not available locally and "
            "cannot be downloaded (no egress). Pass pre-tokenized int arrays "
            "of shape (B, max_length) instead of strings."
        ) from e
    enc = tok(
        list(texts), truncation=True, max_length=max_length,
        padding="max_length", return_tensors="np",
    )
    return jnp.asarray(enc["input_ids"].astype("int32"))


class _T5EmbedderBase(nn.Module):
    """Shared forward for FrozenT5Embedder (modules.py:332-370) and
    FrozenByT5Embedder (:372-412): tokenize -> T5 encoder -> last hidden
    state (B, S, d_model), routed to crossattn by rank."""

    version: str = "google/t5-v1_1-xxl"
    device: str = "tpu"
    max_length: int = 77
    freeze: bool = True
    dtype: Dtype = jnp.float32
    # explicit arch overrides (else resolved from `version`)
    d_model: Optional[int] = None
    d_ff: Optional[int] = None
    num_layers: Optional[int] = None
    num_heads: Optional[int] = None
    d_kv: Optional[int] = None
    vocab_size: Optional[int] = None

    def _arch(self):
        base = _T5_ARCHS.get(self.version, _T5_ARCHS["google/t5-v1_1-xxl"])
        d_model, d_ff, layers, heads, d_kv, vocab, gated = base
        return dict(
            d_model=self.d_model or d_model,
            d_ff=self.d_ff or d_ff,
            num_layers=self.num_layers or layers,
            num_heads=self.num_heads or heads,
            d_kv=self.d_kv or d_kv,
            vocab_size=self.vocab_size or vocab,
            gated_ff=gated,
        )

    def _tokenize(self, text) -> jnp.ndarray:
        raise NotImplementedError

    @nn.compact
    def __call__(self, text) -> jnp.ndarray:
        from gcd_tpu.models.text_towers import T5Encoder

        if not isinstance(text, jnp.ndarray):
            text = self._tokenize(text)
        z = T5Encoder(dtype=self.dtype, name="transformer", **self._arch())(text)
        return jax.lax.stop_gradient(z) if self.freeze else z


@register("sgm.modules.encoders.modules.FrozenT5Embedder")
class FrozenT5Embedder(_T5EmbedderBase):
    def _tokenize(self, text):
        return _tokenize_hf(text, self.version, "T5Tokenizer", self.max_length)


@register("sgm.modules.encoders.modules.FrozenByT5Embedder")
class FrozenByT5Embedder(_T5EmbedderBase):
    version: str = "google/byt5-base"

    def _tokenize(self, text):
        from gcd_tpu.models.text_towers import byt5_tokenize

        return byt5_tokenize(text, self.max_length)


@register("sgm.modules.encoders.modules.FrozenCLIPEmbedder")
class FrozenCLIPEmbedder(nn.Module):
    """HF CLIPTextModel semantics (modules.py:414-477): layer 'last' returns
    the final-LayerNorm'd hidden states, 'pooled' the eot embedding (no
    projection), 'hidden' an intermediate pre-norm hidden state."""

    version: str = "openai/clip-vit-large-patch14"
    device: str = "tpu"
    max_length: int = 77
    freeze: bool = True
    layer: str = "last"
    layer_idx: Optional[int] = None
    always_return_pooled: bool = False
    dtype: Dtype = jnp.float32
    width: Optional[int] = None
    layers: Optional[int] = None
    heads: Optional[int] = None
    vocab_size: int = 49408

    @nn.compact
    def __call__(self, text):
        from gcd_tpu.models.text_towers import CLIPTextTower

        assert self.layer in ("last", "pooled", "hidden")
        if self.layer == "hidden":
            assert self.layer_idx is not None
        if not isinstance(text, jnp.ndarray):
            text = _tokenize_hf(text, self.version, "CLIPTokenizer",
                                self.max_length)
        width, layers, heads, _, quick_gelu = _CLIP_TEXT_ARCHS.get(
            self.version, _CLIP_TEXT_ARCHS["openai/clip-vit-large-patch14"]
        )
        out = CLIPTextTower(
            vocab_size=self.vocab_size,
            width=self.width or width,
            layers=self.layers or layers,
            heads=self.heads or heads,
            context_length=self.max_length,
            output_dim=None,  # HF CLIPTextModel pooler has no projection
            quick_gelu=quick_gelu,
            dtype=self.dtype,
            name="transformer",
        )(text)
        if self.layer == "last":
            z = out["normed"]
        elif self.layer == "pooled":
            z = out["pooled"][:, None, :]
        else:
            z = out["hidden"][self.layer_idx]
        if self.freeze:
            z = jax.lax.stop_gradient(z)
            out = jax.tree.map(jax.lax.stop_gradient, out)
        if self.always_return_pooled:
            return z, out["pooled"]
        return z


class _OpenCLIPTextBase(nn.Module):
    arch: str = "ViT-H-14"
    version: str = "laion2b_s32b_b79k"
    device: str = "tpu"
    max_length: int = 77
    freeze: bool = True
    layer: str = "last"
    dtype: Dtype = jnp.float32
    # arch overrides (else resolved from `arch`; shrunk in unit tests)
    width: Optional[int] = None
    layers: Optional[int] = None
    heads: Optional[int] = None
    output_dim: Optional[int] = None
    vocab_size: int = 49408

    def _tower(self):
        from gcd_tpu.models.text_towers import CLIPTextTower

        width, layers, heads, output_dim, quick_gelu = _CLIP_TEXT_ARCHS.get(
            self.arch, _CLIP_TEXT_ARCHS["ViT-H-14"]
        )
        return CLIPTextTower(
            vocab_size=self.vocab_size,
            width=self.width or width,
            layers=self.layers or layers,
            heads=self.heads or heads,
            context_length=self.max_length,
            output_dim=self.output_dim or output_dim,
            quick_gelu=quick_gelu,
            dtype=self.dtype,
            name="model",
        )

    def _tokens(self, text):
        if isinstance(text, jnp.ndarray):
            return text
        # open_clip.tokenize == HF CLIPTokenizer with the same 49408 BPE vocab
        return _tokenize_hf(text, "openai/clip-vit-large-patch14",
                            "CLIPTokenizer", self.max_length)


@register("sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder")
class FrozenOpenCLIPEmbedder(_OpenCLIPTextBase):
    """modules.py:581-651: 'last' = ln_final(all blocks), 'penultimate' =
    ln_final(all-but-last blocks)."""

    @nn.compact
    def __call__(self, text):
        assert self.layer in ("last", "penultimate")
        out = self._tower()(self._tokens(text))
        z = out["normed" if self.layer == "last" else "normed_penultimate"]
        return jax.lax.stop_gradient(z) if self.freeze else z


@register("sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder2")
class FrozenOpenCLIPEmbedder2(_OpenCLIPTextBase):
    """modules.py:479-578. legacy=True: ln_final(chosen hidden). legacy=False:
    raw (pre-ln) hidden states, plus the eot-pooled projected embedding when
    always_return_pooled."""

    always_return_pooled: bool = False
    legacy: bool = True

    @nn.compact
    def __call__(self, text):
        assert self.layer in ("last", "penultimate", "pooled")
        tokens = self._tokens(text)
        out = self._tower()(tokens)
        if self.freeze:
            out = jax.tree.map(jax.lax.stop_gradient, out)
        if self.legacy:
            assert not self.always_return_pooled
            return out["normed" if self.layer == "last" else
                       "normed_penultimate"]
        z = out["last" if self.layer in ("last", "pooled") else "penultimate"]
        if self.always_return_pooled:
            return z, out["pooled"]
        return z


@register("sgm.modules.encoders.modules.LowScaleEncoder")
class LowScaleEncoder(nn.Module):
    """Noise-augmented low-resolution conditioning encoder
    (modules.py:906-1000; used by SD-upscaler-style models, not by GCD).
    Encodes x with a KL autoencoder, draws a random DDPM noise level in
    [0, max_noise_level) and q-samples the latent to it, then nearest-resizes
    to `output_size`. Returns (z_t, noise_level)."""

    model_config: Dict = None
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    timesteps: int = 1000
    max_noise_level: int = 250
    output_size: Optional[int] = 64
    scale_factor: float = 1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        from gcd_tpu.ops.basic import make_beta_schedule
        import numpy as np

        cfg = self.model_config or {}
        params = dict(cfg.get("params", {}))
        dd = dict(params.get("ddconfig", {}))
        dd.pop("lossconfig", None)
        dd.pop("attn_type", None)
        self._embed_dim = int(params.get("embed_dim", 4))
        self._double_z = bool(dd.get("double_z", True))
        self._encoder = VAEEncoder(**dd, dtype=self.dtype, name="encoder")
        dec_dd = dict(dd)
        self._decoder_cfg = dec_dd
        from gcd_tpu.models.vae import Decoder as VAEDecoder

        self._decoder = VAEDecoder(**dec_dd, dtype=self.dtype, name="decoder")
        mult = 2 if self._double_z else 1
        self._quant = nn.Conv(mult * self._embed_dim, (1, 1),
                              dtype=self.dtype, name="quant_conv")
        self._post_quant = nn.Conv(int(dd.get("z_channels", 4)), (1, 1),
                                   dtype=self.dtype, name="post_quant_conv")

        betas = make_beta_schedule(
            "linear", self.timesteps, linear_start=self.linear_start,
            linear_end=self.linear_end)
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        self._sqrt_acp = jnp.asarray(np.sqrt(alphas_cumprod), jnp.float32)
        self._sqrt_1macp = jnp.asarray(
            np.sqrt(1.0 - alphas_cumprod), jnp.float32)

    def __call__(self, x: jnp.ndarray):
        moments = self._quant(self._encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jax.random.normal(
            self.make_rng("gaussian"), mean.shape, dtype=mean.dtype)
        z = z * self.scale_factor
        b = x.shape[0]
        noise_level = jax.random.randint(
            self.make_rng("noise_level"), (b,), 0, self.max_noise_level)
        noise = jax.random.normal(self.make_rng("q_noise"), z.shape, z.dtype)
        sa = self._sqrt_acp[noise_level].reshape(b, 1, 1, 1).astype(z.dtype)
        s1 = self._sqrt_1macp[noise_level].reshape(b, 1, 1, 1).astype(z.dtype)
        z = sa * z + s1 * noise
        if self.output_size is not None:
            n, h, w, c = z.shape
            z = jax.image.resize(
                z, (n, self.output_size, self.output_size, c), method="nearest")
        return z, noise_level

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        z = z / self.scale_factor
        return self._decoder(self._post_quant(z))
