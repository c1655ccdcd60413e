"""LoRA adapters for parameter-efficient fine-tuning.

Behavioral reference: gcd-model/sgm/models/diffusion.py:134-155 (`ft_strategy:
time_lora`): every nn.Linear whose name (or parent's name) contains "time" is
wrapped with a rank-16 peft LoRA adapter; base weights are frozen.

JAX-functional design: instead of swapping module classes, LoRA lives as a
*separate* parameter tree ``{path: {"lora_a": (in, r), "lora_b": (r, out)}}``
plus a pure function that merges deltas into the dense kernels before the
forward pass (weight-space merge — mathematically identical to activation-space
LoRA for Dense layers, and it keeps the UNet's compiled graph unchanged).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _iter_paths(tree: Dict, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _iter_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def lora_target_paths(params: Dict, match: str = "time") -> list:
    """Dense kernels whose path contains `match` (diffusion.py:137-151 walks
    linear layers under *time* names)."""
    out = []
    for path, leaf in _iter_paths(params):
        if path[-1] != "kernel" or leaf.ndim != 2:
            continue
        if any(match in seg for seg in path[:-1]):
            out.append(path)
    return out


def init_lora_params(key: jax.Array, params: Dict, rank: int = 16,
                     match: str = "time") -> Dict:
    """A (kaiming-init A, zero-init B) pair per target kernel — standard LoRA
    init so the adapted model starts identical to the base."""
    lora: Dict = {}
    targets = lora_target_paths(params, match)
    keys = jax.random.split(key, max(len(targets), 1))
    for k, path in zip(keys, targets):
        kernel = _get(params, path)
        d_in, d_out = kernel.shape
        a = jax.random.normal(k, (d_in, rank), dtype=jnp.float32) / np.sqrt(d_in)
        b = jnp.zeros((rank, d_out), dtype=jnp.float32)
        _set(lora, path[:-1] + ("lora_a",), a)
        _set(lora, path[:-1] + ("lora_b",), b)
    return lora


def apply_lora(params: Dict, lora: Dict, scale: float = 1.0) -> Dict:
    """Merge LoRA deltas: kernel + scale * A @ B. Returns a new tree sharing
    untouched leaves."""

    def merge(p_node: Dict, l_node: Dict) -> Dict:
        out = {}
        for k, v in p_node.items():
            if isinstance(v, dict):
                out[k] = merge(v, l_node.get(k, {})) if k in l_node else v
            else:
                out[k] = v
        if "lora_a" in l_node and "kernel" in out:
            delta = l_node["lora_a"] @ l_node["lora_b"]
            out["kernel"] = out["kernel"] + scale * delta.astype(out["kernel"].dtype)
        return out

    return merge(params, lora)


def count_lora_params(lora: Dict) -> int:
    return sum(int(np.prod(l.shape)) for _, l in _iter_paths(lora))
