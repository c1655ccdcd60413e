"""Loss weightings w(sigma) (reference: sgm/modules/diffusionmodules/loss_weighting.py).

GCD trains with EDMWeighting(sigma_data=1.0) (train_kubric_max90.yaml:149-151).
"""

from __future__ import annotations

import jax.numpy as jnp

from gcd_tpu.utils.config import register


@register("sgm.modules.diffusionmodules.loss_weighting.UnitWeighting",
          "sgm.modules.diffusionmodules.denoiser_weighting.UnitWeighting")
class UnitWeighting:
    def __call__(self, sigma: jnp.ndarray) -> jnp.ndarray:
        return jnp.ones_like(sigma)


@register("sgm.modules.diffusionmodules.loss_weighting.EDMWeighting",
          "sgm.modules.diffusionmodules.denoiser_weighting.EDMWeighting")
class EDMWeighting:
    def __init__(self, sigma_data: float = 0.5):
        self.sigma_data = float(sigma_data)

    def __call__(self, sigma: jnp.ndarray) -> jnp.ndarray:
        return (sigma**2 + self.sigma_data**2) / (sigma * self.sigma_data) ** 2


@register("sgm.modules.diffusionmodules.loss_weighting.VWeighting",
          "sgm.modules.diffusionmodules.denoiser_weighting.VWeighting")
class VWeighting(EDMWeighting):
    def __init__(self):
        super().__init__(sigma_data=1.0)


@register("sgm.modules.diffusionmodules.loss_weighting.EpsWeighting",
          "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting")
class EpsWeighting:
    def __call__(self, sigma: jnp.ndarray) -> jnp.ndarray:
        return sigma**-2.0
