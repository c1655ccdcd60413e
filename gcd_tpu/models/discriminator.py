"""PatchGAN discriminator + LPIPS/GAN autoencoder training loss.

Reference: gcd-model/sgm/modules/autoencoding/lpips/model/model.py:17
(NLayerDiscriminator) and losses/discriminator_loss.py:17
(GeneralLPIPSWithDiscriminator). GCD's shipped runs never train the VAE
(loss_config is torch.nn.Identity, train_kubric_max90.yaml:162-163), but the
loss is part of the sgm surface for first-stage training.

JAX adaptations:
  * BatchNorm running stats live in the "batch_stats" collection
    (apply with mutable=["batch_stats"] during discriminator training).
  * The adaptive discriminator weight (discriminator_loss.py:196-205 —
    ||grad(nll, last_layer)|| / ||grad(g, last_layer)||) cannot be computed
    from a tensor handle post-hoc in jax; `adaptive_weight_from_grads` takes
    the two gradients w.r.t. the decoder's last-layer params (obtained with
    jax.grad over closures) and reproduces the same clamp/scale.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcd_tpu.utils.config import register, instantiate_from_config

Dtype = Any


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray):
    """lpips/vqperceptual.py:5-9."""
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray):
    """lpips/vqperceptual.py:12-17."""
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


class ActNorm(nn.Module):
    """Affine per-channel norm (lpips/util.py:45). Data-dependent init is the
    caller's job in jax (params are plain loc/scale)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        return (x + loc) * scale


@register("sgm.modules.autoencoding.lpips.model.model.NLayerDiscriminator")
class NLayerDiscriminator(nn.Module):
    """Pix2Pix PatchGAN discriminator (model.py:17-87), NHWC. Returns a
    (B, H', W', 1) patch logit map."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        def norm(h, name):
            if self.use_actnorm:
                return ActNorm(name=name)(h)
            return nn.BatchNorm(
                use_running_average=not training, momentum=0.9, epsilon=1e-5,
                name=name,
            )(h)

        use_bias = self.use_actnorm  # BatchNorm has affine params already
        kw, pad = 4, ((1, 1), (1, 1))
        h = nn.Conv(self.ndf, (kw, kw), strides=(2, 2), padding=pad,
                    dtype=self.dtype, name="main_0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        layer = 2
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=(2, 2),
                        padding=pad, use_bias=use_bias, dtype=self.dtype,
                        name=f"main_{layer}")(h)
            h = norm(h, f"main_{layer + 1}")
            h = nn.leaky_relu(h, 0.2)
            layer += 3
        nf_mult = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=(1, 1), padding=pad,
                    use_bias=use_bias, dtype=self.dtype,
                    name=f"main_{layer}")(h)
        h = norm(h, f"main_{layer + 1}")
        h = nn.leaky_relu(h, 0.2)
        layer += 3
        return nn.Conv(1, (kw, kw), strides=(1, 1), padding=pad,
                       dtype=self.dtype, name=f"main_{layer}")(h)


def adaptive_weight_from_grads(nll_grads, g_grads,
                               discriminator_weight: float = 1.0):
    """discriminator_loss.py:196-205 with gradients supplied by the caller
    (pytrees or arrays of d(loss)/d(last_layer_params))."""
    def _norm(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2)
                            for l in leaves))

    d_weight = _norm(nll_grads) / (_norm(g_grads) + 1e-4)
    d_weight = jnp.clip(d_weight, 0.0, 1e4)
    return jax.lax.stop_gradient(d_weight) * discriminator_weight


@register(
    "sgm.modules.autoencoding.losses.discriminator_loss."
    "GeneralLPIPSWithDiscriminator"
)
@register("sgm.modules.autoencoding.losses.GeneralLPIPSWithDiscriminator")
class GeneralLPIPSWithDiscriminator:
    """Two-phase autoencoder loss (discriminator_loss.py:17-293).

    Functional usage:
        loss_mod = GeneralLPIPSWithDiscriminator(disc_start=...)
        variables = loss_mod.init(key, img_shape)
        loss, log = loss_mod(variables, inputs, recons, optimizer_idx=0,
                             global_step=..., regularization_log={...},
                             d_weight=..., lpips_params=...)

    optimizer_idx 0 = generator phase, 1 = discriminator phase (the reference
    drives these through Lightning's alternating optimizers). `d_weight`
    is the adaptive weight (see adaptive_weight_from_grads); defaults to the
    reference's eval behavior (always 1.0 in eval, discriminator_loss.py:252).

    With training=True, __call__ returns (loss, log, new_variables): both
    discriminator passes run in train mode (BatchNorm normalizes with batch
    statistics, as the torch reference does under model.train()) and the
    updated running stats are threaded back to the caller. With
    training=False it returns (loss, log) and is pure.
    """

    def __init__(
        self,
        disc_start: int,
        logvar_init: float = 0.0,
        disc_num_layers: int = 3,
        disc_in_channels: int = 3,
        disc_factor: float = 1.0,
        disc_weight: float = 1.0,
        perceptual_weight: float = 1.0,
        disc_loss: str = "hinge",
        scale_input_to_tgt_size: bool = False,
        dims: int = 2,
        learn_logvar: bool = False,
        regularization_weights: Optional[Dict[str, float]] = None,
        additional_log_keys=None,
        discriminator_config: Optional[Dict] = None,
    ):
        assert disc_loss in ("hinge", "vanilla")
        assert not scale_input_to_tgt_size, "unused by all sgm configs"
        self.dims = dims
        self.disc_start = disc_start
        self.logvar_init = logvar_init
        self.learn_logvar = learn_logvar
        self.perceptual_weight = perceptual_weight
        self.disc_factor = disc_factor
        self.discriminator_weight = disc_weight
        self.disc_loss = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
        self.regularization_weights = regularization_weights or {}
        self.additional_log_keys = set(additional_log_keys or [])
        self.additional_log_keys.update(self.regularization_weights.keys())
        if discriminator_config is None:
            self.discriminator = NLayerDiscriminator(
                input_nc=disc_in_channels, n_layers=disc_num_layers,
                use_actnorm=False,
            )
        else:
            self.discriminator = instantiate_from_config(discriminator_config)
        self._lpips = None

    def init(self, key, img_shape=(1, 64, 64, 3)) -> Dict:
        variables = dict(self.discriminator.init(
            key, jnp.zeros(img_shape), training=False))
        variables["logvar"] = jnp.asarray(self.logvar_init, jnp.float32)
        return variables

    def _perceptual(self, lpips_params, a, b):
        from gcd_tpu.models.lpips import LPIPS

        if lpips_params is None:
            return 0.0
        if self._lpips is None:
            self._lpips = LPIPS()
        return self._lpips.apply(lpips_params, a, b)

    def get_nll_loss(self, logvar, rec_loss, weights=None):
        """discriminator_loss.py:294-306."""
        nll = rec_loss / jnp.exp(logvar) + logvar
        weighted = nll if weights is None else weights * nll
        return (jnp.sum(nll) / nll.shape[0],
                jnp.sum(weighted) / weighted.shape[0])

    def __call__(
        self,
        variables: Dict,
        inputs: jnp.ndarray,
        reconstructions: jnp.ndarray,
        *,
        optimizer_idx: int,
        global_step,
        regularization_log: Optional[Dict] = None,
        split: str = "train",
        weights=None,
        d_weight=None,
        lpips_params: Optional[Dict] = None,
        training: bool = False,
    ) -> Tuple[jnp.ndarray, Dict]:
        if self.dims > 2:
            # (B, T, H, W, C) -> (B*T, H, W, C): LPIPS per frame
            inputs = inputs.reshape(-1, *inputs.shape[-3:])
            reconstructions = reconstructions.reshape(
                -1, *reconstructions.shape[-3:])
        regularization_log = regularization_log or {}
        logvar = variables["logvar"]
        disc_vars = {k: v for k, v in variables.items() if k != "logvar"}

        rec_loss = jnp.abs(inputs - reconstructions)
        if self.perceptual_weight > 0:
            if lpips_params is None:
                raise ValueError(
                    "perceptual_weight > 0 requires lpips_params (pass the "
                    "loaded LPIPS variables, or construct the loss with "
                    "perceptual_weight=0)"
                )
            p = self._perceptual(lpips_params, inputs, reconstructions)
            # LPIPS returns (N,); the reference keeps p_loss as (N,1,1,1) so
            # it broadcasts against the (N,H,W,C) pixel loss
            # (discriminator_loss.py rec_loss + self.perceptual_weight*p_loss).
            rec_loss = rec_loss + self.perceptual_weight * p.reshape(
                (-1,) + (1,) * (rec_loss.ndim - 1))

        # Reference gating (discriminator_loss.py:242,280): the GAN terms are
        # active once global_step >= disc_start OR whenever not training.
        if training:
            active = jnp.asarray(global_step >= self.disc_start, jnp.float32)
        else:
            active = jnp.asarray(1.0, jnp.float32)
        new_variables = variables
        log: Dict = {}
        if optimizer_idx == 0:
            nll_loss, weighted_nll = self.get_nll_loss(logvar, rec_loss,
                                                       weights)
            if training:
                # Torch runs the discriminator under model.train() here too:
                # BatchNorm normalizes with batch stats and updates the
                # running averages as a side effect.
                logits_fake, mut = self.discriminator.apply(
                    disc_vars, reconstructions, training=True,
                    mutable=["batch_stats"])
                new_variables = {**variables, **mut}
            else:
                logits_fake = self.discriminator.apply(
                    disc_vars, reconstructions, training=False)
            g_loss = -jnp.mean(logits_fake)
            if d_weight is None:
                if training:
                    raise ValueError(
                        "training generator phase needs the adaptive d_weight "
                        "— compute it with adaptive_weight_from_grads() over "
                        "jax.grad of nll/g losses w.r.t. the decoder's last "
                        "layer (discriminator_loss.py:196-205)"
                    )
                d_weight = 1.0  # reference eval behavior (:252)
            d_w = jnp.asarray(d_weight) * active
            loss = weighted_nll + d_w * self.disc_factor * g_loss
            for k, v in regularization_log.items():
                if k in self.regularization_weights:
                    loss = loss + self.regularization_weights[k] * v
                if k in self.additional_log_keys:
                    log[f"{split}/{k}"] = jnp.mean(v)
            log.update({
                f"{split}/loss/total": loss,
                f"{split}/loss/nll": nll_loss,
                f"{split}/loss/rec": jnp.mean(rec_loss),
                f"{split}/loss/g": g_loss,
                f"{split}/scalars/logvar": logvar,
                f"{split}/scalars/d_weight": jnp.asarray(d_weight),
            })
            if training:
                return loss, log, new_variables
            return loss, log
        elif optimizer_idx == 1:
            sg = jax.lax.stop_gradient
            if training:
                # Sequential passes as in torch: real first (updates running
                # stats), then fake against the already-updated stats.
                logits_real, mut = self.discriminator.apply(
                    disc_vars, sg(inputs), training=True,
                    mutable=["batch_stats"])
                disc_vars = {**disc_vars, **mut}
                logits_fake, mut = self.discriminator.apply(
                    disc_vars, sg(reconstructions), training=True,
                    mutable=["batch_stats"])
                new_variables = {**variables, **mut}
            else:
                logits_real = self.discriminator.apply(
                    disc_vars, sg(inputs), training=False)
                logits_fake = self.discriminator.apply(
                    disc_vars, sg(reconstructions), training=False)
            d_loss = self.disc_factor * self.disc_loss(logits_real,
                                                       logits_fake) * active
            log = {
                f"{split}/loss/disc": d_loss,
                f"{split}/logits/real": jnp.mean(logits_real),
                f"{split}/logits/fake": jnp.mean(logits_fake),
            }
            if training:
                return d_loss, log, new_variables
            return d_loss, log
        raise NotImplementedError(f"Unknown optimizer_idx {optimizer_idx}")
