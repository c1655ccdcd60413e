"""Full-size SPMD compile check, run as a child process by
tests/test_spmd_fullsize.py (VERDICT r2 "Next round" #3).

Lowers + compiles — never executes — the flagship training step and the
serving sampler over an 8-device virtual CPU mesh at production shapes
(320-ch / ~1.5B-param VideoUNet, t=14, 32x48 latents, reference scale point
gcd-model/main.py:826-843 which trains the full replica per GPU). Everything
before this ran the sharding rules only on the tiny test engine
(tests/test_parallel.py); divisibility or involuntary-remat surprises at the
real dims are exactly what this program probes.

Checks:
  1. make_param_shardings leaves no big leaf silently replicated (every leaf
     >= min_weight_size gets a non-trivial PartitionSpec unless it is in the
     documented _FSDP_EXCLUDE_SUBSTRINGS list), and the tensor axis actually
     lands on attention/MLP projections.
  2. The full train step (engine.loss fwd+bwd + Adam) compiles against those
     shardings with donated state (AOT .lower().compile(), no 6 GB param
     materialization on the test host).
  3. The serving sampler (conditioner -> 25-step scan -> VAE decode) compiles
     over the same mesh with a bt-sharded batch.
  4. Stderr stays free of "Involuntary full rematerialization" (asserted by
     the parent test over this child's output).
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gcd_tpu.engine.trainer import make_optimizer, train_step  # noqa: E402
from gcd_tpu.parallel.mesh import (  # noqa: E402
    _FSDP_EXCLUDE_SUBSTRINGS,
    create_mesh,
    make_batch_shardings,
    make_param_shardings,
)
from gcd_tpu.utils.config import instantiate_from_config, load_config  # noqa: E402

H, W, T = 256, 384, 14
MIN_WEIGHT = 2 ** 18


def abstract(tree, shardings):
    return jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        tree, shardings)


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "pretrained",
                                   "kubric_gradual_max90.yaml"))
    mcfg = cfg["model"]
    mcfg["params"].pop("ckpt_path", None)  # no released 20 GB ckpt in-env
    engine = instantiate_from_config(mcfg)

    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    key = jax.random.PRNGKey(0)

    # ---- abstract full-size params + sharding-rule audit ----
    pshapes = jax.eval_shape(
        lambda k: engine.init_params(k, img_hw=(H, W), t=T), key)
    shardings = make_param_shardings(pshapes, mesh, MIN_WEIGHT)

    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(pshapes))
    print(f"full-size param count: {n_params/1e9:.2f}B")
    assert n_params > 1.2e9, "flagship engine unexpectedly small"

    silently_replicated = []
    tp_hits = 0
    flat = jax.tree_util.tree_leaves_with_path(pshapes)
    shmap = {jax.tree_util.keystr(p): s for p, s in
             jax.tree_util.tree_leaves_with_path(shardings)}
    for path, leaf in flat:
        ps = jax.tree_util.keystr(path)
        spec = shmap[ps].spec
        if "tensor" in str(spec):
            tp_hits += 1
        if (int(np.prod(leaf.shape)) >= MIN_WEIGHT
                and spec == P()
                and not any(s in ps for s in _FSDP_EXCLUDE_SUBSTRINGS)):
            silently_replicated.append((ps, tuple(leaf.shape)))
    assert tp_hits > 50, f"tensor axis applied to only {tp_hits} leaves"
    assert not silently_replicated, (
        "big leaves silently replicated (P() fallback): "
        f"{silently_replicated[:10]} (+{max(0, len(silently_replicated)-10)})")
    print(f"sharding audit OK: {tp_hits} tensor-parallel leaves, "
          "0 silent replications")

    # ---- train step compile (AOT, donated state) ----
    opt = make_optimizer(engine, pshapes, 2e-5)
    ostate_shapes = jax.eval_shape(opt.init, pshapes)
    # Optimizer-state leaves mirror param leaves -> reuse the param rules
    # (the same placement GSPMD would propagate from a jitted opt.init).
    ostate_shard = make_param_shardings(ostate_shapes, mesh, MIN_WEIGHT)

    from gcd_tpu.engine.trainer import TrainState

    state_abs = TrainState(
        params=abstract(pshapes, shardings),
        opt_state=abstract(ostate_shapes, ostate_shard),
        step=jax.ShapeDtypeStruct((), jnp.int32,
                                  sharding=NamedSharding(mesh, P())),
        ema=None,
    )
    batch = engine.example_batch((H, W), T, b=2)
    batch.pop("num_video_frames")  # static scalar, not a traced arg
    bshard = make_batch_shardings(batch, mesh)
    batch_abs = abstract(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            batch),
        bshard)
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                   sharding=NamedSharding(mesh, P()))

    import functools

    from gcd_tpu.ops.dispatch import TRAIN_TRACE_FLAGS, kernel_flags

    step_fn = functools.partial(train_step, engine, opt)
    # Trace under the SAME flag overrides the production trainer traces with
    # (make_jitted_train_step) so this compiles the production grad program.
    with mesh, kernel_flags(**TRAIN_TRACE_FLAGS):
        lowered = jax.jit(step_fn, donate_argnums=(0,)).lower(
            state_abs, batch_abs, key_abs)
        compiled = lowered.compile()
    print("train step compiled OK at full size "
          f"(donated state, mesh={dict(mesh.shape)})")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"  argument bytes/device: {mem.argument_size_in_bytes/2**30:.2f} GiB, "
              f"temp bytes/device: {mem.temp_size_in_bytes/2**30:.2f} GiB")

    # ---- serving sampler compile (replicated params, bt-sharded batch) ----
    sbatch = engine.example_batch((H, W), T, b=2)
    sbatch.pop("num_video_frames")
    sb_abs = abstract(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            sbatch),
        make_batch_shardings(sbatch, mesh))
    replicated = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                       sharding=NamedSharding(mesh, P())),
        pshapes)

    def sample(params, batch, key):
        return engine.sample_video(params, batch, key, num_steps=2)

    with mesh:
        jax.jit(sample, out_shardings=NamedSharding(mesh, P())).lower(
            replicated, sb_abs, key_abs).compile()
    print("serving sampler compiled OK at full size")
    print("SPMD_FULLSIZE_OK")


if __name__ == "__main__":
    main()
