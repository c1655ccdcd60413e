"""Basic tensor ops shared across models.

Reference semantics: gcd-model/sgm/modules/diffusionmodules/util.py
(timestep_embedding :207, GroupNorm32 :274).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: int = 10000,
    repeat_only: bool = False,
) -> jnp.ndarray:
    """Sinusoidal embeddings, [cos | sin] order (util.py:207-230). (N,) -> (N, dim)."""
    if repeat_only:
        return jnp.broadcast_to(timesteps[:, None], (timesteps.shape[0], dim))
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def make_beta_schedule(schedule: str, n_timestep: int,
                       linear_start: float = 1e-4, linear_end: float = 2e-2):
    """Linear DDPM beta schedule (diffusionmodules/util.py:20-33); f64 like
    the reference, returned as a numpy array."""
    import numpy as np

    if schedule != "linear":
        raise NotImplementedError(f"beta schedule '{schedule}'")
    return np.linspace(linear_start**0.5, linear_end**0.5, n_timestep,
                       dtype=np.float64) ** 2


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, 2H, 2W, C) nearest-neighbor upsample via
    broadcast+reshape. `jax.image.resize(method="nearest")` lowers to a
    gather, which XLA:TPU turns into a serial while-loop running at ~1 GB/s
    (measured: 5.4 ms of `while` per 14-frame VAE decode); the broadcast
    form compiles to plain vectorized copies."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
