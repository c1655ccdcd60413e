"""Classifier-free-guidance guiders (reference: sgm/modules/diffusionmodules/guiders.py).

GCD's production guider is `LinearPredictionGuider` (guiders.py:60): per-frame CFG scale
linspace(min_scale, max_scale) over the T frames of a clip. Convention: the doubled
batch is ``concat([uc, c])`` along axis 0 — uc first (guiders.py:96) — which matters
for weight-conversion parity.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import jax.numpy as jnp

from gcd_tpu.utils.config import register
from gcd_tpu.utils.misc import append_dims, default

COND_KEYS = ("vector", "crossattn", "concat")


@register("sgm.modules.diffusionmodules.guiders.IdentityGuider")
class IdentityGuider:
    def __call__(self, x: jnp.ndarray, sigma) -> jnp.ndarray:
        return x

    def prepare_inputs(self, x, s, c: Dict, uc: Dict) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
        return x, s, dict(c)


@register("sgm.modules.diffusionmodules.guiders.VanillaCFG")
class VanillaCFG:
    def __init__(self, scale: float):
        self.scale = float(scale)

    def __call__(self, x: jnp.ndarray, sigma) -> jnp.ndarray:
        x_u, x_c = jnp.split(x, 2, axis=0)
        return x_u + self.scale * (x_c - x_u)

    def prepare_inputs(self, x, s, c: Dict, uc: Dict):
        c_out = {}
        for k in c:
            if k in COND_KEYS:
                c_out[k] = jnp.concatenate((uc[k], c[k]), axis=0)
            else:
                c_out[k] = c[k]
        return jnp.concatenate([x, x], axis=0), jnp.concatenate([s, s], axis=0), c_out


@register("sgm.modules.diffusionmodules.guiders.LinearPredictionGuider")
class LinearPredictionGuider:
    def __init__(
        self,
        max_scale: float,
        num_frames: int,
        min_scale: float = 1.0,
        additional_cond_keys: Optional[Union[List[str], str]] = None,
    ):
        self.min_scale = float(min_scale)
        self.max_scale = float(max_scale)
        self.num_frames = int(num_frames)
        self.scale = jnp.linspace(min_scale, max_scale, num_frames)[None, :]

        additional_cond_keys = default(additional_cond_keys, [])
        if isinstance(additional_cond_keys, str):
            additional_cond_keys = [additional_cond_keys]
        self.additional_cond_keys = list(additional_cond_keys)

    def __call__(self, x: jnp.ndarray, sigma) -> jnp.ndarray:
        # x: (2*B*T, ...), uc first.
        x_u, x_c = jnp.split(x, 2, axis=0)
        t = self.num_frames
        bt = x_u.shape[0]
        x_u = x_u.reshape((bt // t, t) + x_u.shape[1:])
        x_c = x_c.reshape((bt // t, t) + x_c.shape[1:])
        scale = append_dims(self.scale, x_u.ndim).astype(x_u.dtype)
        out = x_u + scale * (x_c - x_u)
        return out.reshape((bt,) + out.shape[2:])

    def prepare_inputs(self, x, s, c: Dict, uc: Dict):
        c_out = {}
        for k in c:
            if k in COND_KEYS or k in self.additional_cond_keys:
                c_out[k] = jnp.concatenate((uc[k], c[k]), axis=0)
            elif "hijack" not in k:
                c_out[k] = c[k]
        return jnp.concatenate([x, x], axis=0), jnp.concatenate([s, s], axis=0), c_out
