"""Training-time sigma samplers (reference: sgm/modules/diffusionmodules/sigma_sampling.py).

JAX-functional: every sampler takes an explicit PRNG key.
GCD trains with EDMSampling(p_mean=1.0, p_std=1.6) (train_kubric_max90.yaml:153-157).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gcd_tpu.utils.config import register, instantiate_from_config


@register("sgm.modules.diffusionmodules.sigma_sampling.EDMSampling")
class EDMSampling:
    def __init__(self, p_mean: float = -1.2, p_std: float = 1.2):
        self.p_mean = float(p_mean)
        self.p_std = float(p_std)

    def __call__(self, key: jax.Array, n_samples: int,
                 rand: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if rand is None:
            rand = jax.random.normal(key, (n_samples,), dtype=jnp.float32)
        log_sigma = self.p_mean + self.p_std * rand
        return jnp.exp(log_sigma)


@register("sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling")
class DiscreteSampling:
    def __init__(self, discretization_config, num_idx: int,
                 do_append_zero: bool = False, flip: bool = True):
        self.num_idx = int(num_idx)
        self.sigmas = jnp.asarray(
            instantiate_from_config(discretization_config)(
                num_idx, do_append_zero=do_append_zero, flip=flip
            )
        )

    def idx_to_sigma(self, idx) -> jnp.ndarray:
        return self.sigmas[idx]

    def __call__(self, key: jax.Array, n_samples: int,
                 rand: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if rand is None:
            rand = jax.random.randint(key, (n_samples,), 0, self.num_idx)
        return self.idx_to_sigma(rand)
