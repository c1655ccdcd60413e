"""Ahead-of-time export of the sampling program via `jax.export`.

Production serving wants the inference program compiled once and shipped as
an artifact, with the serving host needing only weights + the artifact — no
model-construction code, no config system, no retracing. The reference has
no equivalent (its scripts re-instantiate the torch module per process,
scripts/eval_utils.py:35); this is a TPU-native capability: the whole
`sample_video` pipeline (conditioner -> 25-step CFG scan -> VAE decode) is
one jitted program, so it serializes to a single portable StableHLO artifact.

Usage:
    blob = export_sampler(engine, params, batch, num_steps=25)
    open("sampler.jaxexp", "wb").write(blob)
    # serving host:
    sample = load_sampler(open("sampler.jaxexp", "rb").read())
    out = sample(params, batch_arrays, key)   # dict, as engine.sample_video

Weights stay OUT of the artifact (they are arguments, loaded from the
checkpoint store at serving time), so the blob is megabytes, not gigabytes.
Shapes are fixed at export time — one artifact per (B, T, H, W) serving
configuration, matching how XLA programs are cached anyway.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _split_batch(batch: Dict) -> Tuple[Dict, Dict]:
    """Split a batch dict into (array leaves, static python-value entries)."""
    arrays = {k: v for k, v in batch.items()
              if hasattr(v, "shape") and hasattr(v, "dtype")}
    static = {k: v for k, v in batch.items() if k not in arrays}
    return arrays, static


def make_sample_fn(engine, static_batch: Dict,
                   num_steps: Optional[int] = None,
                   decoding_t: Optional[int] = None):
    """Close over the engine and the batch's static (non-array) entries,
    leaving a (params, arrays, key) -> dict function ready for jit/export."""

    def fn(params, arrays: Dict, key):
        batch = dict(arrays)
        batch.update(static_batch)
        return engine.sample_video(params, batch, key, num_steps=num_steps,
                                   decoding_t=decoding_t)

    return fn


def export_sampler(engine, params, batch: Dict, key=None,
                   num_steps: Optional[int] = None,
                   decoding_t: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the full sampling program for (params, batch)'s shapes.

    `platforms` (e.g. ("tpu",) or ("tpu", "cpu")) pins the target backends;
    default is the current one. Returns the serialized artifact bytes.
    """
    from jax import export as jexport

    from gcd_tpu.ops.dispatch import kernel_flags, program_flag_overrides

    if key is None:
        key = jax.random.PRNGKey(0)
    arrays, static = _split_batch(batch)
    fn = make_sample_fn(engine, static, num_steps, decoding_t)

    def sds(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
            tree)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    # Export bakes the traced program into the artifact, so the program-level
    # kernel policy (PERF_BATCH batch-4 layout pathology) must be applied at
    # trace time here — a batched artifact exported without it would ship the
    # pathological program permanently.
    frames = arrays.get("cond_frames", arrays.get("jpg"))
    bt_extent = 2 * int(frames.shape[0]) if frames is not None else 0
    with kernel_flags(**program_flag_overrides(bt_extent)):
        exp = jexport.export(jax.jit(fn), **kwargs)(sds(params), sds(arrays),
                                                    sds(key))
    return bytes(exp.serialize())


def load_sampler(blob: bytes):
    """Deserialize an export_sampler artifact into a callable
    (params, batch_arrays, key) -> dict. Non-array batch entries were baked
    in at export time; pass only the array leaves."""
    from jax import export as jexport

    exp = jexport.deserialize(blob)

    def sample(params, arrays: Dict, key):
        return exp.call(params, arrays, key)

    return sample
