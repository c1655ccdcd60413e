"""Config system: YAML configs with `target:`/`params:` reflective instantiation.

Stays schema-compatible with the reference's OmegaConf configs
(reference: gcd-model/sgm/util.py:168-185 instantiate_from_config / get_obj_from_str,
gcd-model/main.py:722-726 multi-file merge + CLI dotlist overrides) without depending
on OmegaConf: plain nested dicts + a deep-merge + a dotlist parser.

Reference `target:` strings like ``sgm.modules.diffusionmodules.denoiser.Denoiser``
are resolved through an alias registry so the original pretrained/*.yaml files drive
the new TPU backend unchanged.
"""

from __future__ import annotations

import copy
import importlib
from functools import partial
from typing import Any, Dict, List, Optional

import yaml

# ---------------------------------------------------------------------------
# Registry: maps target strings (ours and the reference's) to python objects.
# ---------------------------------------------------------------------------

_REGISTRY: Dict[str, Any] = {}


def register(*names: str):
    """Class decorator: register a class under one or more target-string aliases.

    The class is always also registered under its own
    ``gcd_tpu.<module>.<ClassName>`` path implicitly (importable anyway).
    """

    def deco(cls):
        for name in names:
            _REGISTRY[name] = cls
        return cls

    return deco


def register_alias(name: str, obj: Any) -> None:
    _REGISTRY[name] = obj


def get_obj_from_str(string: str, reload: bool = False):
    """Resolve a target string to a python object.

    Order: explicit registry (covers reference `sgm.*` aliases), then a plain
    module import of ``pkg.mod.Obj``.
    """
    # Importing the package registers all aliases as a side effect.
    import gcd_tpu.registry  # noqa: F401

    if string in _REGISTRY:
        return _REGISTRY[string]
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Dict[str, Any], **extra_kwargs):
    """Instantiate ``config['target']`` with ``config['params']`` (sgm/util.py:168)."""
    if "target" not in config:
        if config.get("__is_first_stage__", False):
            return None
        if config.get("__is_unconditional__", False):
            return None
        raise KeyError("Expected key `target` to instantiate.")
    cls = get_obj_from_str(config["target"])
    params = dict(config.get("params", {}) or {})
    params.update(extra_kwargs)
    return cls(**params)


def partial_from_config(config: Dict[str, Any], **extra):
    cls = get_obj_from_str(config["target"])
    params = dict(config.get("params", {}) or {})
    params.update(extra)
    return partial(cls, **params)


# ---------------------------------------------------------------------------
# YAML loading / merging / dotlist overrides (OmegaConf-compatible subset).
# ---------------------------------------------------------------------------


def load_config(path: str) -> Dict[str, Any]:
    """Load a YAML config.

    Extension over the reference's OmegaConf loader: a top-level
    ``include: [relative paths]`` list pulls in base files (recursively),
    merged left-to-right, with the including file's own content merged last.
    This keeps the shipped config family DRY (configs/base/*) while the
    reference's monolithic yamls still load unchanged (they have no
    ``include`` key)."""
    import os

    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    cfg = cfg or {}
    includes = cfg.pop("include", None)
    if includes:
        base_dir = os.path.dirname(os.path.abspath(path))
        merged: Dict[str, Any] = {}
        for rel in includes:
            inc_path = rel if os.path.isabs(rel) else os.path.join(base_dir, rel)
            merged = _deep_merge(merged, load_config(inc_path))
        cfg = _deep_merge(merged, cfg)
    return cfg


def _deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def merge_configs(configs: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Left-to-right deep merge, matching OmegaConf.merge (main.py:722-726)."""
    out: Dict[str, Any] = {}
    for cfg in configs:
        out = _deep_merge(out, cfg)
    return out


def _parse_value(raw: str) -> Any:
    val = yaml.safe_load(raw)
    if isinstance(val, str):
        # YAML 1.1 misses bare scientific notation like `1e-4`.
        try:
            return float(val)
        except ValueError:
            return val
    return val


def from_dotlist(dotlist: List[str]) -> Dict[str, Any]:
    """Parse ``["a.b.c=1", "x=[2,3]"]`` into a nested dict (CLI override syntax)."""
    out: Dict[str, Any] = {}
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"dotlist item without '=': {item!r}")
        key, raw = item.split("=", 1)
        node = out
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(raw)
    return out


def apply_dotlist(cfg: Dict[str, Any], dotlist: List[str]) -> Dict[str, Any]:
    return merge_configs([cfg, from_dotlist(dotlist)])


def set_by_path(cfg: Dict[str, Any], path: str, value: Any) -> None:
    """In-place set of a dotted path (inference-time config surgery helper)."""
    node = cfg
    parts = path.split(".")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def get_by_path(cfg: Dict[str, Any], path: str, default: Any = None) -> Any:
    node = cfg
    for p in path.split("."):
        if not isinstance(node, dict) or p not in node:
            return default
        node = node[p]
    return node


def config_to_dict(cfg: Any) -> Any:
    """Identity for plain dicts; keeps API parity with OmegaConf.to_container."""
    return copy.deepcopy(cfg)


def save_config(cfg: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
