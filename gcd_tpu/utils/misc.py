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


# ---------------------------------------------------------------------------
# Remaining sgm/util helpers (gcd-model/sgm/util.py) — kept API-compatible so
# ported tooling can import them from here.
# ---------------------------------------------------------------------------


def is_power_of_two(n) -> bool:
    """util.py:36-50."""
    if n <= 0:
        return False
    return (n & (n - 1)) == 0


def get_string_from_tuple(s: str):
    """util.py:20-33: unwrap "('a', 'b')"-style strings."""
    try:
        if s.startswith("(") and s.endswith(")"):
            t = eval(s)  # noqa: S307 — mirrors the reference behavior
            if isinstance(t, tuple):
                return t[0]
        return s
    except Exception:
        return s


def mean_flat(tensor: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dims (util.py:153-158)."""
    return jnp.mean(tensor, axis=tuple(range(1, tensor.ndim)))


def partialclass(cls, *args, **kwargs):
    """util.py:98-102."""
    import functools

    class NewCls(cls):
        __init__ = functools.partialmethod(cls.__init__, *args, **kwargs)

    NewCls.__name__ = cls.__name__
    return NewCls


def make_path_absolute(path: str) -> str:
    """util.py:105-109 (fsspec-aware in the reference; plain paths here)."""
    import os

    if "://" in path:
        return path
    return os.path.abspath(path)


def ismap(x) -> bool:
    """util.py:112-115 — NHWC here: map = more than 3 channels."""
    return hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] > 3


def isimage(x) -> bool:
    """util.py:118-121 — NHWC: 1 or 3 channels."""
    return hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] in (1, 3)


def isheatmap(x) -> bool:
    """util.py:124-128."""
    return hasattr(x, "ndim") and x.ndim == 2


def isneighbors(x) -> bool:
    """util.py:131-134 — NHWC: (B, N, H, W, C)."""
    return hasattr(x, "ndim") and x.ndim == 5 and x.shape[-1] in (1, 3)


def disabled_train(self, mode=True):
    """util.py:14-17: no-op train() for frozen torch modules. In jax,
    frozenness is structural (stop_gradient / excluded from the optimizer),
    so this exists only for API compatibility."""
    return self


def autocast(f, enabled=True):
    """util.py:52-61: torch.autocast wrapper. JAX precision is explicit
    (module dtypes / fp32 islands), so this is an identity decorator kept for
    ported call sites."""
    return f


def log_txt_as_img(wh, xc, size: int = 10):
    """Render strings to image tensors for logging (util.py:68-95).
    Returns (B, H, W, 3) float32 in [-1, 1] (NHWC; reference is NCHW)."""
    import numpy as np

    try:
        from PIL import Image, ImageDraw, ImageFont
    except ImportError:  # pragma: no cover
        b = len(xc)
        return np.zeros((b, wh[1], wh[0], 3), np.float32)

    txts = []
    for text in xc:
        txt = Image.new("RGB", wh, color="white")
        draw = ImageDraw.Draw(txt)
        try:
            font = ImageFont.truetype("DejaVuSans.ttf", size=size)
        except Exception:
            font = ImageFont.load_default()
        nc = int(40 * (wh[0] / 256))
        lines = "\n".join(
            text[start:start + nc] for start in range(0, len(text), nc))
        try:
            draw.text((0, 0), lines, fill="black", font=font)
        except UnicodeEncodeError:
            pass
        arr = np.array(txt).astype(np.float32) / 127.5 - 1.0
        txts.append(arr)
    return np.stack(txts)


def get_nested_attribute(obj, attribute_path, depth=None, return_key=False):
    """util.py:251-275: dotted attribute access with list indexing."""
    attributes = attribute_path.split(".")
    if depth is not None and depth > 0:
        attributes = attributes[:depth]
    assert len(attributes) > 0
    current_attribute = obj
    current_key = None
    for level, attribute in enumerate(attributes):
        current_key = ".".join(attributes[: level + 1])
        try:
            id_ = int(attribute)
            current_attribute = current_attribute[id_]
        except ValueError:
            current_attribute = getattr(current_attribute, attribute)
    return (current_attribute, current_key) if return_key else current_attribute
