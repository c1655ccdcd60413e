"""LR schedulers: python-vs-jnp formula parity and end-to-end wiring into the
train step (VERDICT.md round-1 weak #7: scheduler_config was dead code).

Reference: gcd-model/sgm/lr_scheduler.py and diffusion.py:412-430
(configure_optimizers builds the optimizer from optimizer_config and wraps the
scheduler's multiplier in LambdaLR).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gcd_tpu.engine.lr_schedule import (
    LambdaLinearScheduler,
    LambdaWarmUpCosineScheduler,
    LambdaWarmUpCosineScheduler2,
)
from gcd_tpu.engine.trainer import (
    _optax_from_optimizer_config,
    make_schedule_fn,
)


STEPS = [0, 1, 5, 99, 100, 101, 500, 999, 1000, 1001, 5000, 20000]


def test_warmup_cosine_jnp_matches_python():
    s = LambdaWarmUpCosineScheduler(
        warm_up_steps=100, lr_min=0.1, lr_max=1.0, lr_start=0.0,
        max_decay_steps=1000)
    for n in STEPS:
        np.testing.assert_allclose(
            float(s.schedule_jnp(n)), s.schedule(n), rtol=1e-5, atol=1e-7)


def test_warmup_cosine2_jnp_matches_python():
    # steps stay within the total cycle budget: beyond it the reference's
    # find_in_interval indexes out of range (faithful quirk, lr_scheduler.py:60)
    s = LambdaWarmUpCosineScheduler2(
        warm_up_steps=[100, 50], f_min=[0.1, 0.05], f_max=[1.0, 0.5],
        f_start=[0.0, 0.0], cycle_lengths=[1000, 100000])
    for n in STEPS:
        np.testing.assert_allclose(
            float(s.schedule_jnp(n)), s.schedule(n), rtol=1e-5, atol=1e-7)


def test_lambda_linear_jnp_matches_python():
    s = LambdaLinearScheduler(
        warm_up_steps=[100], f_min=[0.0], f_max=[1.0], f_start=[1e-6],
        cycle_lengths=[100000])
    for n in STEPS:
        np.testing.assert_allclose(
            float(s.schedule_jnp(n)), s.schedule(n), rtol=1e-5, atol=1e-7)


def test_make_schedule_fn_from_reference_target():
    fn = make_schedule_fn({
        "target": "sgm.lr_scheduler.LambdaLinearScheduler",
        "params": {"warm_up_steps": [10], "f_min": [1.0], "f_max": [1.0],
                   "f_start": [1e-6], "cycle_lengths": [10000000000000]},
    }, base_lr=2e-5)
    # the SD-style config: ramp 1e-6 -> 1 over 10 steps, then hold
    assert float(fn(0)) == pytest.approx(2e-5 * 1e-6, rel=1e-3)
    assert float(fn(5)) == pytest.approx(2e-5 * 0.5, rel=1e-2)
    assert float(fn(10)) == pytest.approx(2e-5, rel=1e-4)
    assert float(fn(1000)) == pytest.approx(2e-5, rel=1e-4)
    assert make_schedule_fn(None, 1.0) is None


def test_schedule_traces_inside_jit():
    fn = make_schedule_fn({
        "target": "sgm.lr_scheduler.LambdaWarmUpCosineScheduler",
        "params": {"warm_up_steps": 10, "lr_min": 0.1, "lr_max": 1.0,
                   "lr_start": 0.0, "max_decay_steps": 100},
    }, base_lr=1.0)
    out = jax.jit(fn)(jnp.asarray(50))
    assert np.isfinite(float(out))


def test_optimizer_config_mapping_changes_updates():
    """torch.optim.Adam with L2 weight_decay vs plain Adam must differ, and
    AdamW must decouple the decay (update independent of grad scale)."""
    params = {"w": jnp.ones((4,)) * 2.0}
    # Adam's first update is sign-invariant (-lr*sign(g)); a zero-grad element
    # is the discriminator: L2-into-grad makes it move, plain Adam does not.
    grads = {"w": jnp.asarray([0.0, 0.5, 0.5, 0.5])}

    def one_update(opt):
        st = opt.init(params)
        upd, _ = opt.update(grads, st, params)
        return upd["w"]

    plain = one_update(_optax_from_optimizer_config(
        {"target": "torch.optim.Adam"}, 1e-2))
    l2 = one_update(_optax_from_optimizer_config(
        {"target": "torch.optim.Adam", "params": {"weight_decay": 0.1}}, 1e-2))
    adamw = one_update(_optax_from_optimizer_config(
        {"target": "torch.optim.AdamW", "params": {"weight_decay": 0.1}}, 1e-2))
    assert not np.allclose(np.asarray(plain), np.asarray(l2))
    assert not np.allclose(np.asarray(l2), np.asarray(adamw))
    # torch Adam semantics: wd folds into the gradient, so the sign-invariant
    # Adam magnitude stays ~lr; AdamW adds -lr*wd*param on top
    np.testing.assert_allclose(np.asarray(adamw),
                               np.asarray(plain) - 1e-2 * 0.1 * 2.0, rtol=1e-4)

    with pytest.raises(ValueError, match="unsupported optimizer target"):
        _optax_from_optimizer_config({"target": "torch.optim.LBFGS"}, 1e-2)

    # SGD honors weight_decay (torch semantics: L2 into the gradient before
    # the momentum buffer) instead of silently dropping it...
    sgd = one_update(_optax_from_optimizer_config(
        {"target": "torch.optim.SGD", "params": {"momentum": 0.9}}, 1e-2))
    sgd_wd = one_update(_optax_from_optimizer_config(
        {"target": "torch.optim.SGD",
         "params": {"momentum": 0.9, "weight_decay": 0.1}}, 1e-2))
    np.testing.assert_allclose(np.asarray(sgd_wd),
                               np.asarray(sgd) - 1e-2 * 0.1 * 2.0, rtol=1e-4)
    # ...and Adam/AdamW reject a momentum param instead of ignoring it.
    with pytest.raises(ValueError, match="momentum"):
        _optax_from_optimizer_config(
            {"target": "torch.optim.Adam", "params": {"momentum": 0.9}}, 1e-2)


def test_scheduler_changes_training_lr_trajectory():
    """End-to-end: a LambdaLinearScheduler with a long warmup must make the
    first update tiny compared to constant-LR training (VERDICT done-check)."""
    from gcd_tpu.utils.config import instantiate_from_config
    from gcd_tpu.utils.testing import tiny_engine_config
    from gcd_tpu.engine.trainer import create_train_state, make_jitted_train_step

    t, h, w = 2, 16, 16
    cfg = tiny_engine_config()
    cfg["params"]["sampler_config"]["params"]["guider_config"]["params"][
        "num_frames"] = t
    engine = instantiate_from_config(cfg)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(h, w), t=t))(key)
    batch = engine.example_batch((h, w), t, 1)

    def first_update_norm(schedule_fn):
        state, opt = create_train_state(engine, params, 2e-2,
                                        schedule_fn=schedule_fn)
        step = make_jitted_train_step(engine, opt)
        new_state, _ = step(state, batch, key)
        # the step donates `state`, so diff against the original param tree
        delta = jax.tree_util.tree_map(
            lambda a, b: jnp.sum((a.astype(jnp.float32)
                                  - b.astype(jnp.float32)) ** 2),
            new_state.params, params)
        return float(jnp.sqrt(sum(jax.tree_util.tree_leaves(delta))))

    const_norm = first_update_norm(None)
    sched = make_schedule_fn({
        "target": "sgm.lr_scheduler.LambdaLinearScheduler",
        "params": {"warm_up_steps": [10000], "f_min": [1.0], "f_max": [1.0],
                   "f_start": [1e-6], "cycle_lengths": [10000000000000]},
    }, base_lr=2e-2)
    sched_norm = first_update_norm(sched)
    assert sched_norm < const_norm * 1e-2, (const_norm, sched_norm)
