"""Small tensor / python helpers (reference: gcd-model/sgm/util.py)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def default(val: Optional[Any], d: Any) -> Any:
    """Return `val` if it is not None, else `d` (callable `d` is invoked)."""
    if val is not None:
        return val
    return d() if callable(d) else d


def exists(val: Optional[Any]) -> bool:
    return val is not None


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Append trailing size-1 dims to `x` until it has `target_ndim` dims.

    Reference semantics: sgm/util.py:192 (append_dims).
    """
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


def append_zero(x: jnp.ndarray) -> jnp.ndarray:
    """Append a single zero to a 1-D sigma ladder (sgm/util.py:188)."""
    return jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])


def expand_dims_like(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Expand `x` with trailing dims until it matches `y.ndim` (sgm/util.py:141)."""
    while x.ndim != y.ndim:
        x = x[..., None]
    return x


def count_params(params) -> int:
    """Total number of scalars in a pytree of arrays (sgm/util.py:161)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def flatten_bt(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) -> (B*T, ...)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def unflatten_bt(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """(B*T, ...) -> (B, T, ...)."""
    return x.reshape((x.shape[0] // t, t) + x.shape[1:])
