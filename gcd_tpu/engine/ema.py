"""Exponential moving average of parameters.

Behavioral reference: gcd-model/sgm/modules/ema.py (LitEma :5): shadow buffers
with warmup decay ``min(decay, (1+n)/(10+n))`` and store/copy_to/restore used
via `ema_scope`. Functional here: EMA state is a pytree carried through the
train step; "entering the EMA scope" is just evaluating with `ema.params`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any           # shadow pytree
    num_updates: jnp.ndarray
    decay: float


def ema_init(params, decay: float = 0.9999) -> EmaState:
    return EmaState(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        num_updates=jnp.zeros((), dtype=jnp.int32),
        decay=float(decay),
    )


def ema_update(state: EmaState, new_params) -> EmaState:
    n = state.num_updates + 1
    decay = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - decay
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p), state.params, new_params
    )
    return EmaState(params=shadow, num_updates=n, decay=state.decay)


def ema_swap(state: EmaState, params):
    """Returns (ema_params, live_params) — caller decides which to evaluate."""
    return state.params, params
