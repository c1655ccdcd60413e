"""AOT export of the sampling program (gcd_tpu/engine/export.py).

Round-trips engine.sample_video through jax.export serialize/deserialize on
the tiny full-stack engine and asserts the artifact reproduces the direct
call bit-for-bit (same program, same backend, same inputs)."""

import jax
import numpy as np
import pytest

from gcd_tpu.engine.export import export_sampler, load_sampler
from gcd_tpu.utils.config import instantiate_from_config
from tests.helpers import tiny_engine_config

B, T, H, W = 1, 3, 32, 48


@pytest.fixture(scope="module")
def engine():
    return instantiate_from_config(tiny_engine_config())


@pytest.fixture(scope="module")
def engine_params(engine):
    key = jax.random.PRNGKey(0)
    batch = engine.example_batch((H, W), T, B)
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(H, W), t=T))(key)
    return params, batch


def test_export_roundtrip_matches_direct_call(engine, engine_params):
    params, batch = engine_params
    key = jax.random.PRNGKey(7)

    blob = export_sampler(engine, params, batch, num_steps=3, decoding_t=3)
    assert isinstance(blob, bytes) and len(blob) > 1000
    # Weights are arguments, not constants: artifact stays small.
    param_bytes = sum(a.size * a.dtype.itemsize
                      for a in jax.tree_util.tree_leaves(params))
    assert len(blob) < max(param_bytes, 10_000_000)

    sample = load_sampler(blob)
    arrays = {k: v for k, v in batch.items()
              if hasattr(v, "shape") and hasattr(v, "dtype")}
    out = sample(params, arrays, key)

    direct = jax.jit(
        lambda p, b, k: engine.sample_video(p, b, k, num_steps=3, decoding_t=3)
    )(params, batch, key)

    assert set(direct.keys()) == set(out.keys())
    np.testing.assert_allclose(np.asarray(out["sampled_video"]),
                               np.asarray(direct["sampled_video"]),
                               rtol=1e-5, atol=1e-5)
    assert out["sampled_video"].shape == (B * T, H, W, 3)


def test_export_rejects_wrong_shape(engine, engine_params):
    params, batch = engine_params
    blob = export_sampler(engine, params, batch, num_steps=2, decoding_t=3)
    sample = load_sampler(blob)
    arrays = {k: v for k, v in batch.items()
              if hasattr(v, "shape") and hasattr(v, "dtype")}
    bad = dict(arrays)
    bad["cond_frames"] = bad["cond_frames"][:, : H // 2]
    with pytest.raises(Exception):
        jax.block_until_ready(sample(params, bad, jax.random.PRNGKey(0)))
