"""DiffusionEngine end-to-end tests on a tiny full-stack config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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

    # init must run jitted — eager dispatch is too slow on this host.
    params = jax.jit(
        lambda k: engine.init_params(k, img_hw=(H, W), t=T)
    )(key)
    return params, batch


def test_init_rejects_illegal_resolution(engine):
    """Frames must divide 8 * 2^(unet levels - 1) — the reference's
    'resolution must be a multiple of 64' assert (gcd-model/scripts/
    test.py:309-310), generalized to this tiny 2-level config (div=16)."""
    with pytest.raises(ValueError, match="multiple of 16"):
        engine.init_params(jax.random.PRNGKey(0), img_hw=(32, 40), t=T)


def test_init_param_tree_structure(engine, engine_params):
    params, _ = engine_params
    assert set(params.keys()) == {"model", "conditioner", "first_stage"}
    assert "input_blocks_0_0" in params["model"]
    assert "embedders_0" in params["conditioner"]
    assert "encoder" in params["first_stage"] and "decoder" in params["first_stage"]


def test_loss_shapes_and_grads_masked(engine, engine_params):
    params, batch = engine_params
    key = jax.random.PRNGKey(1)
    batch = dict(batch)
    batch["jpg"] = jax.random.normal(key, (B * T, H, W, 3)) * 0.2

    @jax.jit
    def loss_mean(p):
        return engine.loss(p, batch, key, global_step=0).mean()

    val, grads = jax.jit(jax.value_and_grad(loss_mean))(params)
    assert np.isfinite(float(val))
    # first stage frozen via stop_gradient in encode path
    fs_leaves = jax.tree_util.tree_leaves(grads["first_stage"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in fs_leaves)
    # frozen (non-trainable) CLIP embedder gets zero grads through stop_gradient
    clip_leaves = jax.tree_util.tree_leaves(grads["conditioner"]["embedders_0"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in clip_leaves)


def test_trainable_mask_strategies(engine, engine_params):
    params, _ = engine_params
    mask = engine.trainable_mask(params)
    # everything: all model params trainable, first stage frozen
    assert all(jax.tree_util.tree_leaves(mask["model"]))
    assert not any(jax.tree_util.tree_leaves(mask["first_stage"]))
    # conditioner: motion_bucket (idx 2) + spherical (idx 5) trainable
    assert all(jax.tree_util.tree_leaves(mask["conditioner"]["embedders_5"]))
    assert not any(jax.tree_util.tree_leaves(mask["conditioner"]["embedders_0"]))

    engine.ft_strategy = "time"
    mask_t = engine.trainable_mask(params)
    flat = jax.traverse_util.flatten_dict(mask_t["model"]) if hasattr(jax, "traverse_util") else None
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(mask_t["model"])
    on = [k for k, v in flat.items() if v]
    off = [k for k, v in flat.items() if not v]
    assert all("time" in "/".join(k) for k in on)
    assert on and off
    engine.ft_strategy = "everything"


def test_sample_video_shapes(engine, engine_params):
    params, batch = engine_params
    key = jax.random.PRNGKey(2)

    @jax.jit
    def sample(p, key):
        return engine.sample_video(p, batch, key, decoding_t=3)

    out = sample(params, key)
    assert out["sampled_video"].shape == (B * T, H, W, 3)
    assert out["cond_video"].shape == (B * T, H, W, 3)
    assert out["gt_video"].shape == (B * T, H, W, 3)
    v = np.asarray(out["sampled_video"])
    assert np.isfinite(v).all() and v.min() >= 0.0 and v.max() <= 1.0


def test_sample_video_guidance_interval(engine, engine_params):
    """sample_video with a guidance-interval sampler: the plain (half-batch)
    branch must get a correctly-sized image_only_indicator, and a
    full-coverage interval must reproduce exact CFG output."""
    params, batch = engine_params
    key = jax.random.PRNGKey(2)

    exact = jax.jit(
        lambda p, k: engine.sample_video(p, batch, k, decoding_t=3)
    )(params, key)

    old = engine.sampler.guidance_interval
    try:
        engine.sampler.guidance_interval = (0.0, 1e9)  # always guided
        always = jax.jit(
            lambda p, k: engine.sample_video(p, batch, k, decoding_t=3)
        )(params, key)
        engine.sampler.guidance_interval = (-2.0, -1.0)  # never guided
        never = jax.jit(
            lambda p, k: engine.sample_video(p, batch, k, decoding_t=3)
        )(params, key)
    finally:
        engine.sampler.guidance_interval = old

    np.testing.assert_allclose(np.asarray(always["sampled_video"]),
                               np.asarray(exact["sampled_video"]),
                               rtol=1e-5, atol=1e-5)
    v = np.asarray(never["sampled_video"])
    assert np.isfinite(v).all() and v.shape == (B * T, H, W, 3)


def test_encode_decode_roundtrip_scale(engine, engine_params):
    params, _ = engine_params
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (T, H, W, 3)) * 0.1

    @jax.jit
    def roundtrip(x):
        z = engine.encode_first_stage(params, x, key=key)
        return z, engine.decode_first_stage(params, z, decoding_t=3)

    z, rec = roundtrip(x)
    assert z.shape == (T, H // 8, W // 8, 4)
    assert rec.shape == x.shape
    assert np.isfinite(np.asarray(rec)).all()
