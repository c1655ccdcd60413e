"""Vector-quantization regularizers (reference: gcd-model/sgm/modules/
autoencoding/regularizers/quantize.py). Unused by every GCD config — the
shipped VAEs are KL autoencoders — but part of the sgm regularizer surface.

Layout: this framework's VAE latents are channels-last, so quantizers consume
(B, H, W, C) / (B, S, C) directly (the reference rearranges from BCHW,
quantize.py:239-246); the math is identical.

Statefulness: EMAVectorQuantizer's codebook updates live in a flax "ema"
variable collection (the torch version mutates buffers in-place,
quantize.py:337-353); run `.apply(..., mutable=["ema"])` during training.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gcd_tpu.utils.config import register

Dtype = Any


def _load_remap(remap: Optional[str]) -> Optional[jnp.ndarray]:
    if remap is None:
        return None
    return jnp.asarray(np.load(remap))


def _remap_to_used(inds: jnp.ndarray, used: jnp.ndarray, re_embed: int,
                   unknown_index, key: Optional[jax.Array]) -> jnp.ndarray:
    """quantize.py:26-41: map raw codebook ids onto the used-subset ids."""
    ishape = inds.shape
    flat = inds.reshape(ishape[0], -1)
    match = (flat[:, :, None] == used[None, None, :]).astype(jnp.int32)
    new = jnp.argmax(match, axis=-1)
    unknown = jnp.sum(match, axis=2) < 1
    if unknown_index == "random":
        assert key is not None, "random unknown_index needs a PRNG key"
        rand = jax.random.randint(key, new.shape, 0, re_embed)
        new = jnp.where(unknown, rand, new)
    else:
        new = jnp.where(unknown, int(unknown_index), new)
    return new.reshape(ishape)


def _unmap_to_all(inds: jnp.ndarray, used: jnp.ndarray, re_embed: int
                  ) -> jnp.ndarray:
    """quantize.py:43-52."""
    ishape = inds.shape
    flat = inds.reshape(ishape[0], -1)
    if re_embed > used.shape[0]:
        flat = jnp.where(flat >= used.shape[0], 0, flat)
    return used[flat].reshape(ishape)


@register("sgm.modules.autoencoding.regularizers.quantize.VectorQuantizer")
class VectorQuantizer(nn.Module):
    """VQ-VAE bottleneck (quantize.py:172-302): nearest-codebook assignment
    with commitment loss and straight-through gradients."""

    n_e: int
    e_dim: int
    beta: float = 0.25
    remap: Optional[str] = None
    unknown_index: str = "random"
    sane_index_shape: bool = False
    log_perplexity: bool = False
    loss_key: str = "loss/vq"

    @nn.compact
    def __call__(self, z: jnp.ndarray, key: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, Dict]:
        emb = self.param(
            "embedding",
            lambda k, shape: jax.random.uniform(
                k, shape, minval=-1.0 / self.n_e, maxval=1.0 / self.n_e),
            (self.n_e, self.e_dim),
        )
        zf = z.reshape(-1, self.e_dim).astype(jnp.float32)
        embf = emb.astype(jnp.float32)
        d = (
            jnp.sum(zf**2, axis=1, keepdims=True)
            + jnp.sum(embf**2, axis=1)[None, :]
            - 2.0 * zf @ embf.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = emb[idx].reshape(z.shape).astype(z.dtype)

        loss_dict: Dict = {}
        if self.log_perplexity:
            onehot = jax.nn.one_hot(idx, self.n_e, dtype=jnp.float32)
            probs = jnp.mean(onehot, axis=0)
            loss_dict["perplexity"] = jnp.exp(
                -jnp.sum(probs * jnp.log(probs + 1e-10)))
            loss_dict["cluster_usage"] = jnp.sum(probs > 0)

        sg = jax.lax.stop_gradient
        loss = (self.beta * jnp.mean((sg(z_q) - z) ** 2)
                + jnp.mean((z_q - sg(z)) ** 2))
        loss_dict[self.loss_key] = loss

        z_q = z + sg(z_q - z)  # straight-through

        used = _load_remap(self.remap)
        if used is not None:
            idx2 = _remap_to_used(idx.reshape(z.shape[0], -1), used,
                                  used.shape[0], self.unknown_index, key)
            idx = idx2.reshape(-1, 1)
        if self.sane_index_shape:
            if z.ndim == 4:
                idx = idx.reshape(z.shape[0], z.shape[1], z.shape[2])
            else:
                idx = idx.reshape(z.shape[0], -1)
        loss_dict["min_encoding_indices"] = idx
        return z_q, loss_dict

    def get_codebook_entry(self, params, indices: jnp.ndarray,
                           shape: Optional[Tuple[int, ...]] = None
                           ) -> jnp.ndarray:
        emb = params["params"]["embedding"]
        used = _load_remap(self.remap)
        if used is not None:
            assert shape is not None, "Need to give shape for remap"
            indices = _unmap_to_all(indices.reshape(shape[0], -1), used,
                                    self.n_e).reshape(-1)
        z_q = emb[indices]
        if shape is not None:
            z_q = z_q.reshape(shape)  # (B, H, W, C) channels-last
        return z_q


@register(
    "sgm.modules.autoencoding.regularizers.quantize."
    "VectorQuantizerWithInputProjection"
)
class VectorQuantizerWithInputProjection(nn.Module):
    """quantize.py:446-495: Linear in/out projections around VectorQuantizer."""

    input_dim: int
    n_codes: int
    codebook_dim: int
    beta: float = 1.0
    output_dim: Optional[int] = None
    remap: Optional[str] = None
    unknown_index: str = "random"
    sane_index_shape: bool = False
    log_perplexity: bool = False
    loss_key: str = "loss/vq"

    @nn.compact
    def __call__(self, z: jnp.ndarray, key: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, Dict]:
        in_shape = z.shape
        rearr = False
        if z.ndim > 3:
            # (B, ..., C) channels-last -> (B, S, C)
            rearr = self.output_dim is not None
            z = z.reshape(in_shape[0], -1, in_shape[-1])
        z = nn.Dense(self.codebook_dim, name="proj_in")(z)
        z_q, loss_dict = VectorQuantizer(
            n_e=self.n_codes, e_dim=self.codebook_dim, beta=self.beta,
            remap=self.remap, unknown_index=self.unknown_index,
            sane_index_shape=self.sane_index_shape,
            log_perplexity=self.log_perplexity, loss_key=self.loss_key,
            name="quantizer",
        )(z, key=key)
        if self.output_dim is not None:
            z_q = nn.Dense(self.output_dim, name="proj_out")(z_q)
        if rearr:
            z_q = z_q.reshape(*in_shape[:-1], z_q.shape[-1])
        return z_q, loss_dict


@register("sgm.modules.autoencoding.regularizers.quantize.GumbelQuantizer")
class GumbelQuantizer(nn.Module):
    """Gumbel-softmax quantizer (quantize.py:64-169). Channels-last: the 1x1
    projection and one-hot mixing run over the trailing axis."""

    num_hiddens: int
    embedding_dim: int
    n_embed: int
    straight_through: bool = True
    kl_weight: float = 5e-4
    temp_init: float = 1.0
    remap: Optional[str] = None
    unknown_index: str = "random"
    loss_key: str = "loss/vq"

    @nn.compact
    def __call__(self, z: jnp.ndarray, key: Optional[jax.Array] = None,
                 temp: Optional[float] = None, return_logits: bool = False,
                 training: bool = False) -> Tuple[jnp.ndarray, Dict]:
        hard = self.straight_through if training else True
        tau = self.temp_init if temp is None else temp
        logits = nn.Conv(self.n_embed, (1, 1), name="proj")(z)  # (B,H,W,N)
        embed = self.param(
            "embed", nn.initializers.normal(stddev=1.0),
            (self.n_embed, self.embedding_dim),
        )
        out_dict: Dict = {}

        # The reference calls F.gumbel_softmax unconditionally
        # (quantize.py:100), so eval is stochastic too: sample whenever a key
        # is provided. key=None gives a deterministic (zero-noise) eval — a
        # deliberate convenience deviation for keyless inference calls.
        if training:
            assert key is not None, "gumbel sampling needs a PRNG key"
        if key is not None:
            g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
        else:
            g = jnp.zeros(logits.shape, jnp.float32)
        y_soft = jax.nn.softmax((logits.astype(jnp.float32) + g) / tau, axis=-1)
        if hard:
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, self.n_embed, dtype=y_soft.dtype)
            soft_one_hot = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            soft_one_hot = y_soft

        z_q = jnp.einsum("...n,nd->...d", soft_one_hot.astype(z.dtype), embed)

        qy = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        diff = self.kl_weight * jnp.mean(
            jnp.sum(qy * jnp.log(qy * self.n_embed + 1e-10), axis=-1))
        out_dict[self.loss_key] = diff

        ind = jnp.argmax(soft_one_hot, axis=-1)
        out_dict["indices"] = ind
        if return_logits:
            out_dict["logits"] = logits
        return z_q, out_dict


@register("sgm.modules.autoencoding.regularizers.quantize.EMAVectorQuantizer")
class EMAVectorQuantizer(nn.Module):
    """EMA-codebook VQ (quantize.py:355-443). The codebook, cluster sizes and
    embedding averages live in the "ema" variable collection and update when
    the module is applied with mutable=["ema"] and training=True."""

    n_embed: int
    embedding_dim: int
    beta: float
    decay: float = 0.99
    eps: float = 1e-5
    remap: Optional[str] = None
    unknown_index: str = "random"
    loss_key: str = "loss/vq"

    @nn.compact
    def __call__(self, z: jnp.ndarray, training: bool = False
                 ) -> Tuple[jnp.ndarray, Dict]:
        weight = self.variable(
            "ema", "weight",
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (self.n_embed, self.embedding_dim)),
        )
        cluster_size = self.variable(
            "ema", "cluster_size", lambda: jnp.zeros((self.n_embed,)))
        embed_avg = self.variable("ema", "embed_avg", lambda: weight.value)

        zf = z.reshape(-1, self.embedding_dim).astype(jnp.float32)
        w = weight.value
        d = (
            jnp.sum(zf**2, axis=1, keepdims=True)
            + jnp.sum(w**2, axis=1)[None, :]
            - 2.0 * zf @ w.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = w[idx].reshape(z.shape).astype(z.dtype)
        onehot = jax.nn.one_hot(idx, self.n_embed, dtype=jnp.float32)
        probs = jnp.mean(onehot, axis=0)
        perplexity = jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))

        if training:
            counts = jnp.sum(onehot, axis=0)
            new_cs = cluster_size.value * self.decay + counts * (1 - self.decay)
            embed_sum = onehot.T @ zf
            new_avg = embed_avg.value * self.decay + embed_sum * (1 - self.decay)
            n = jnp.sum(new_cs)
            smoothed = (new_cs + self.eps) / (n + self.n_embed * self.eps) * n
            cluster_size.value = new_cs
            embed_avg.value = new_avg
            weight.value = new_avg / smoothed[:, None]

        sg = jax.lax.stop_gradient
        loss = self.beta * jnp.mean((sg(z_q) - z) ** 2)
        z_q = z + sg(z_q - z)
        return z_q, {
            self.loss_key: loss,
            "encodings": onehot,
            "encoding_indices": idx,
            "perplexity": perplexity,
        }
