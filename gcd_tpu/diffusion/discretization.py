"""Sigma-ladder discretizations (reference: sgm/modules/diffusionmodules/discretizer.py).

Ladders are computed with numpy at trace/setup time (they depend only on static
hyper-parameters), returned as jnp arrays so samplers can `lax.scan` over them.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gcd_tpu.utils.config import register


def generate_roughly_equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


class Discretization:
    def __call__(self, n: int, do_append_zero: bool = True, flip: bool = False,
                 device=None) -> np.ndarray:
        # Returned as *numpy* so the ladder stays a static constant under jit
        # (samplers bake it into scan inputs; see sampling.py).
        sigmas = np.asarray(self.get_sigmas(n), dtype=np.float32)
        if do_append_zero:
            sigmas = np.concatenate([sigmas, np.zeros((1,), dtype=np.float32)])
        if flip:
            sigmas = sigmas[::-1].copy()
        return sigmas

    def get_sigmas(self, n: int) -> np.ndarray:
        raise NotImplementedError


@register("sgm.modules.diffusionmodules.discretizer.EDMDiscretization")
class EDMDiscretization(Discretization):
    """Karras rho-schedule; GCD configs use sigma_max=700 (train_kubric_max90.yaml:131)."""

    def __init__(self, sigma_min: float = 0.002, sigma_max: float = 80.0, rho: float = 7.0):
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.rho = float(rho)

    def get_sigmas(self, n: int) -> np.ndarray:
        ramp = np.linspace(0, 1, n, dtype=np.float64)
        min_inv_rho = self.sigma_min ** (1 / self.rho)
        max_inv_rho = self.sigma_max ** (1 / self.rho)
        sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** self.rho
        return sigmas.astype(np.float32)


def make_linear_beta_schedule(n_timestep: int, linear_start: float, linear_end: float) -> np.ndarray:
    """'linear' schedule in sqrt-beta space (sgm/modules/diffusionmodules/util.py:20)."""
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
    )


@register("sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization")
class LegacyDDPMDiscretization(Discretization):
    def __init__(self, linear_start: float = 0.00085, linear_end: float = 0.0120,
                 num_timesteps: int = 1000):
        self.num_timesteps = int(num_timesteps)
        betas = make_linear_beta_schedule(num_timesteps, linear_start, linear_end)
        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas, axis=0)

    def get_sigmas(self, n: int) -> np.ndarray:
        if n < self.num_timesteps:
            timesteps = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            alphas_cumprod = self.alphas_cumprod[timesteps]
        elif n == self.num_timesteps:
            alphas_cumprod = self.alphas_cumprod
        else:
            raise ValueError(f"n={n} > num_timesteps={self.num_timesteps}")
        sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
        # Descending ladder (high noise first), matching discretizer.py:69.
        return sigmas[::-1].astype(np.float32)
