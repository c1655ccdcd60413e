"""SPMD tests on the 8-device virtual CPU mesh: sharded train step runs and
matches the single-device step numerically."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcd_tpu.parallel.mesh import (
    create_mesh,
    make_param_shardings,
    shard_batch,
    shard_params,
)
from gcd_tpu.engine.trainer import (
    create_train_state,
    make_jitted_train_step,
)
from gcd_tpu.utils.config import instantiate_from_config
from tests.helpers import tiny_engine_config

B, T, H, W = 4, 2, 32, 48  # B*T = 8 shards over 8 devices


def _tiny_engine():
    cfg = tiny_engine_config()
    cfg["params"]["sampler_config"]["params"]["guider_config"]["params"][
        "num_frames"
    ] = T
    return instantiate_from_config(cfg)


def test_mesh_creation():
    mesh = create_mesh(data=4, fsdp=2)
    assert mesh.shape == {"data": 4, "fsdp": 2}
    mesh = create_mesh(fsdp=2)
    assert mesh.shape["data"] == 4


def test_param_sharding_rules():
    mesh = create_mesh(data=2, fsdp=4)
    params = {
        "big": jnp.zeros((1024, 512)),
        "small": jnp.zeros((32,)),
        "odd": jnp.zeros((1023, 7)),
    }
    sh = make_param_shardings(params, mesh, min_weight_size=1024)
    assert "fsdp" in str(sh["big"].spec)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"].spec == jax.sharding.PartitionSpec()


def test_emb_mlp_params_stay_replicated():
    """Per-video embedding MLPs are excluded from fsdp sharding: their tiny
    activations make the SPMD partitioner reshard the activation instead of
    gathering the weight (involuntary-remat warnings, VERDICT round-1 #6)."""
    mesh = create_mesh(data=2, fsdp=4)
    params = {"model": {
        "time_embed_0": {"kernel": jnp.zeros((1024, 512))},
        "aux_label_emb_0": {"kernel": jnp.zeros((1024, 512))},
        "input_blocks_1_0": {
            "spatial": {"emb_layers_1": {"kernel": jnp.zeros((1024, 512))},
                        "in_layers_2": {"kernel": jnp.zeros((1024, 512))}},
        },
    }}
    sh = make_param_shardings(params, mesh, min_weight_size=1024)
    m = sh["model"]
    assert m["time_embed_0"]["kernel"].spec == jax.sharding.PartitionSpec()
    assert m["aux_label_emb_0"]["kernel"].spec == jax.sharding.PartitionSpec()
    blk = m["input_blocks_1_0"]["spatial"]
    assert blk["emb_layers_1"]["kernel"].spec == jax.sharding.PartitionSpec()
    assert "fsdp" in str(blk["in_layers_2"]["kernel"].spec)


def test_dryrun_multichip_partitions_without_involuntary_remat():
    """Run the driver hook's SINGLE-PROCESS variant in a fresh process (it
    reconfigures jax platforms) and assert the SPMD partitioner stays
    silent: involuntary full rematerialization means an inefficient
    resharding landmine. Pinned to GCD_DRYRUN_PROCS=1 because the warning
    check needs the partitioner's stderr in THIS process tree's capture;
    the multi-process default is covered by test_dryrun_multichip_default_
    is_multiprocess."""
    import subprocess
    import sys

    env = dict(os.environ, GCD_DRYRUN_PROCS="1")
    r = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dryrun_multichip(8) OK" in r.stdout
    assert "Involuntary full rematerialization" not in r.stderr, (
        "\n".join(l for l in r.stderr.splitlines() if "Involuntary" in l)[:2000])


def test_dryrun_multichip_default_is_multiprocess():
    """The driver artifact path: dryrun_multichip(8) defaults to the true
    multi-host code path (2 jax.distributed processes x 4 local virtual CPU
    devices) over the same 3-axis data/fsdp/tensor mesh."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "GCD_DRYRUN_PROCS"}
    r = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    assert "dryrun_multichip(8, processes=2) OK" in r.stdout


def test_tensor_parallel_sharding_rules():
    """Megatron placement: column layers (to_q/k/v) shard output features
    over "tensor", row layers (to_out_0, net_2) shard input features;
    row bias and non-TP leaves fall back to the fsdp rules."""
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "tensor": 2}
    params = {"model": {"blk": {
        "attn1": {
            "to_q": {"kernel": jnp.zeros((64, 64))},
            "to_out_0": {"kernel": jnp.zeros((64, 64)),
                         "bias": jnp.zeros((64,))},
        },
        "ff": {"net_0": {"proj": {"kernel": jnp.zeros((64, 128)),
                                  "bias": jnp.zeros((128,))}},
               "net_2": {"kernel": jnp.zeros((128, 64))}},
    }}}
    sh = make_param_shardings(params, mesh, min_weight_size=2**30)
    blk = sh["model"]["blk"]
    assert blk["attn1"]["to_q"]["kernel"].spec == P(None, "tensor")
    assert blk["attn1"]["to_out_0"]["kernel"].spec == P("tensor", None)
    assert blk["attn1"]["to_out_0"]["bias"].spec == P()
    # the fused GEGLU [value|gate] concat is NOT column-sharded (a plain
    # spec on the concat dim puts each half on one shard; the downstream
    # half-slices undo it with gathers) — it falls back to the fsdp rules.
    assert blk["ff"]["net_0"]["proj"]["kernel"].spec == P()
    assert blk["ff"]["net_0"]["proj"]["bias"].spec == P()
    assert blk["ff"]["net_2"]["kernel"].spec == P("tensor", None)
    # big TP leaves also pick up an fsdp dim (2D sharding)
    sh2 = make_param_shardings(params, mesh, min_weight_size=1)
    assert sh2["model"]["blk"]["attn1"]["to_q"]["kernel"].spec == P("fsdp", "tensor")


def test_tensor_parallel_train_step_matches_single_device():
    """A dp=2 x fsdp=2 x tensor=2 step must reproduce the single-device step:
    the TP cut is pure sharding annotation, XLA's collectives do the rest."""
    engine = _tiny_engine()
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(H, W), t=T))(key)

    batch = engine.example_batch((H, W), T, B)
    batch["jpg"] = jax.random.normal(jax.random.fold_in(key, 1),
                                     (B * T, H, W, 3)) * 0.3
    batch["cond_frames"] = batch["jpg"] + 0.01
    batch["cond_frames_without_noise"] = batch["jpg"]
    batch["image_only_indicator"] = jnp.zeros((B, T))

    state1, opt1 = create_train_state(engine, params, 1e-4)
    step1 = make_jitted_train_step(engine, opt1, donate=False)
    new1, m1 = step1(state1, batch, key)

    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    sharded_params, _ = shard_params(params, mesh, min_weight_size=2**12)
    sharded_batch, _ = shard_batch(batch, mesh)
    state2, opt2 = create_train_state(engine, sharded_params, 1e-4)
    step2 = make_jitted_train_step(engine, opt2, donate=False)
    new2, m2 = step2(state2, sharded_batch, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4, atol=1e-5)
    l1 = jax.tree_util.tree_leaves(new1.params["model"])[0]
    l2 = jax.tree_util.tree_leaves(new2.params["model"])[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-3,
                               atol=2e-5)


def test_sharded_train_step_matches_single_device():
    engine = _tiny_engine()
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(H, W), t=T))(key)

    batch = engine.example_batch((H, W), T, B)
    batch["jpg"] = jax.random.normal(jax.random.fold_in(key, 1),
                                     (B * T, H, W, 3)) * 0.3
    batch["cond_frames"] = batch["jpg"] + 0.01
    batch["cond_frames_without_noise"] = batch["jpg"]
    batch["image_only_indicator"] = jnp.zeros((B, T))

    # --- single device ---
    state1, opt1 = create_train_state(engine, params, 1e-4)
    step1 = make_jitted_train_step(engine, opt1, donate=False)
    new1, m1 = step1(state1, batch, key)

    # --- 8-device data||fsdp mesh ---
    mesh = create_mesh(data=4, fsdp=2)
    sharded_params, _ = shard_params(params, mesh, min_weight_size=2**12)
    sharded_batch, _ = shard_batch(batch, mesh)
    state2, opt2 = create_train_state(engine, sharded_params, 1e-4)
    step2 = make_jitted_train_step(engine, opt2, donate=False)
    new2, m2 = step2(state2, sharded_batch, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4, atol=1e-5)
    # spot-check an updated parameter tree leaf
    l1 = jax.tree_util.tree_leaves(new1.params["model"])[0]
    l2 = jax.tree_util.tree_leaves(new2.params["model"])[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-3,
                               atol=2e-5)


def test_frozen_params_not_updated():
    engine = _tiny_engine()
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(H, W), t=T))(key)
    # Zero-init output convs block gradient flow into the interior at init
    # (dL/dh through a zero kernel is zero) — perturb the UNet so gradients
    # reach the conditioner, as they would after the first real update.
    params["model"] = jax.tree_util.tree_map(
        lambda p: p + 0.01, params["model"]
    )
    batch = engine.example_batch((H, W), T, B)
    batch["jpg"] = jax.random.normal(key, (B * T, H, W, 3)) * 0.3

    state, opt = create_train_state(engine, params, 1e-2)
    step = make_jitted_train_step(engine, opt, donate=False)
    new_state, _ = step(state, batch, key)

    # First-stage VAE must be bit-identical (frozen).
    for a, b in zip(jax.tree_util.tree_leaves(state.params["first_stage"]),
                    jax.tree_util.tree_leaves(new_state.params["first_stage"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # CLIP embedder frozen too.
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params["conditioner"]["embedders_0"]),
        jax.tree_util.tree_leaves(new_state.params["conditioner"]["embedders_0"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Trainable spherical embedder must have moved.
    a = jax.tree_util.tree_leaves(state.params["conditioner"]["embedders_5"])[0]
    b = jax.tree_util.tree_leaves(new_state.params["conditioner"]["embedders_5"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_sharded_sampler_matches_single_device():
    """Serving path: sample_video sharded over the mesh must reproduce the
    single-device samples (same PRNG key)."""
    from gcd_tpu.engine.serving import make_sharded_sampler

    engine = _tiny_engine()
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(H, W), t=T))(key)

    b = 4  # b*t divisible by the 8-device mesh
    batch = engine.example_batch((H, W), T, b)
    batch["cond_frames_without_noise"] = jax.random.normal(
        jax.random.fold_in(key, 1), (b * T, H, W, 3)) * 0.3
    batch["cond_frames"] = batch["cond_frames_without_noise"] + 0.01

    single = jax.jit(
        lambda p, bt, k: engine.sample_video(p, bt, k, num_steps=2)
    )(params, batch, key)

    mesh = create_mesh(data=4, fsdp=2)
    sampler = make_sharded_sampler(engine, mesh, num_steps=2)
    sharded = sampler(params, batch, key)

    np.testing.assert_allclose(
        np.asarray(sharded["sampled_video"]),
        np.asarray(single["sampled_video"]), rtol=2e-4, atol=2e-4)


def test_tensor_parallel_sampler_matches_single_device():
    """TP serving: with a (data=2, tensor=4) mesh and TP param shardings the
    sampler must reproduce single-device output. Unlike batch sharding, the
    tensor cut scales per-clip latency even when B*T doesn't divide the mesh
    (one 14-frame clip on 8 chips: 14 % 8 != 0 leaves data-sharding useless,
    feature sharding doesn't care)."""
    from gcd_tpu.engine.serving import make_sharded_sampler
    from gcd_tpu.parallel.mesh import make_param_shardings

    engine = _tiny_engine()
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(H, W), t=T))(key)

    b = 4
    batch = engine.example_batch((H, W), T, b)
    batch["cond_frames_without_noise"] = jax.random.normal(
        jax.random.fold_in(key, 1), (b * T, H, W, 3)) * 0.3
    batch["cond_frames"] = batch["cond_frames_without_noise"] + 0.01

    single = jax.jit(
        lambda p, bt, k: engine.sample_video(p, bt, k, num_steps=2)
    )(params, batch, key)

    mesh = create_mesh(data=2, fsdp=1, tensor=4)
    tp_shardings = make_param_shardings(params, mesh, min_weight_size=2**12)
    sampler = make_sharded_sampler(engine, mesh, num_steps=2,
                                   param_shardings=tp_shardings)
    sharded = sampler(params, batch, key)

    np.testing.assert_allclose(
        np.asarray(sharded["sampled_video"]),
        np.asarray(single["sampled_video"]), rtol=2e-4, atol=2e-4)
