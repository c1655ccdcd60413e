"""Denoiser preconditioning transform (reference: sgm/modules/diffusionmodules/denoiser.py).

JAX-functional: `network` is any callable ``network(x, c_noise, cond, **extra) -> out``
(typically a closure over flax params). The denoiser evaluates

    D(x, sigma) = network(x * c_in, c_noise, cond) * c_out + x * c_skip
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from gcd_tpu.utils.config import register, instantiate_from_config
from gcd_tpu.utils.misc import append_dims


@register("sgm.modules.diffusionmodules.denoiser.Denoiser")
class Denoiser:
    def __init__(self, scaling_config: Dict):
        self.scaling = instantiate_from_config(scaling_config)

    def possibly_quantize_sigma(self, sigma: jnp.ndarray) -> jnp.ndarray:
        return sigma

    def possibly_quantize_c_noise(self, c_noise: jnp.ndarray) -> jnp.ndarray:
        return c_noise

    def __call__(
        self,
        network: Callable,
        x: jnp.ndarray,
        sigma: jnp.ndarray,
        cond: Dict,
        **additional_model_inputs,
    ) -> jnp.ndarray:
        sigma = self.possibly_quantize_sigma(sigma)
        sigma_shape = sigma.shape
        sigma_bc = append_dims(sigma, x.ndim)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma_bc)
        c_noise = self.possibly_quantize_c_noise(c_noise.reshape(sigma_shape))
        out = network(x * c_in, c_noise, cond, **additional_model_inputs)
        return out.astype(jnp.float32) * c_out + x * c_skip


@register("sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser")
class DiscreteDenoiser(Denoiser):
    def __init__(
        self,
        scaling_config: Dict,
        num_idx: int,
        discretization_config: Dict,
        do_append_zero: bool = False,
        quantize_c_noise: bool = True,
        flip: bool = True,
    ):
        super().__init__(scaling_config)
        discretization = instantiate_from_config(discretization_config)
        self.sigmas = jnp.asarray(
            discretization(num_idx, do_append_zero=do_append_zero, flip=flip)
        )
        self.quantize_c_noise = quantize_c_noise
        self.num_idx = num_idx

    def sigma_to_idx(self, sigma: jnp.ndarray) -> jnp.ndarray:
        dists = sigma - self.sigmas[:, None]
        return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)

    def idx_to_sigma(self, idx) -> jnp.ndarray:
        return self.sigmas[idx]

    def possibly_quantize_sigma(self, sigma: jnp.ndarray) -> jnp.ndarray:
        return self.idx_to_sigma(self.sigma_to_idx(sigma))

    def possibly_quantize_c_noise(self, c_noise: jnp.ndarray) -> jnp.ndarray:
        if self.quantize_c_noise:
            return self.sigma_to_idx(c_noise).astype(jnp.float32)
        return c_noise
