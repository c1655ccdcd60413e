"""EDM-family denoiser preconditioning coefficients.

Pure functions of sigma returning ``(c_skip, c_out, c_in, c_noise)`` such that

    D(x, sigma) = network(x * c_in, c_noise, cond) * c_out + x * c_skip

Behavior matches reference gcd-model/sgm/modules/diffusionmodules/denoiser_scaling.py;
GCD's production scaling is `VScalingWithEDMcNoise` (v-parameterization scales with
the EDM ``0.25*log(sigma)`` noise conditioning, denoiser_scaling.py:53).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gcd_tpu.utils.config import register

Array = jnp.ndarray
ScalingOut = Tuple[Array, Array, Array, Array]


@register("sgm.modules.diffusionmodules.denoiser_scaling.EDMScaling")
class EDMScaling:
    def __init__(self, sigma_data: float = 0.5):
        self.sigma_data = float(sigma_data)

    def __call__(self, sigma: Array) -> ScalingOut:
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd2)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise


@register("sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling")
class EpsScaling:
    def __call__(self, sigma: Array) -> ScalingOut:
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


@register("sgm.modules.diffusionmodules.denoiser_scaling.VScaling")
class VScaling:
    def __call__(self, sigma: Array) -> ScalingOut:
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


@register("sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise")
class VScalingWithEDMcNoise:
    """The scaling GCD's released models use (v-scales + EDM c_noise)."""

    def __call__(self, sigma: Array) -> ScalingOut:
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise


@register("sgm.modules.diffusionmodules.denoiser_scaling.DumbScaling")
class DumbScaling:
    def __call__(self, sigma: Array) -> ScalingOut:
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = 0.25 * jnp.log(sigma)
        c_skip = jnp.zeros_like(sigma)
        c_out = jnp.ones_like(sigma)
        return c_skip, c_out, c_in, c_noise
