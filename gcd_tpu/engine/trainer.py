"""Train state + jitted/pjitted train step.

Replaces the reference's Lightning Trainer loop (gcd-model/main.py:828-999):
Adam (optax) with frozen-parameter masking (ft strategies + frozen VAE/CLIP),
optional EMA, gradient accumulation, and SPMD sharding over a ("data", "fsdp")
mesh — the DDP all-reduce becomes an XLA psum emitted by pjit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gcd_tpu.engine.ema import EmaState, ema_init, ema_update
from gcd_tpu.engine.engine import DiffusionEngine
from gcd_tpu.parallel.mesh import (
    create_mesh,
    make_batch_shardings,
    make_param_shardings,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema: Optional[EmaState]


def make_schedule_fn(scheduler_config, base_lr: float):
    """Build an optax learning-rate schedule from the engine's YAML
    scheduler_config (reference: diffusion.py:420-430 — LambdaLR over the
    instantiated scheduler's multiplier). Returns None for no scheduler
    (constant LR, the shipped configs' behavior)."""
    if scheduler_config is None:
        return None
    from gcd_tpu.utils.config import instantiate_from_config

    sched = instantiate_from_config(scheduler_config)
    if not hasattr(sched, "schedule_jnp"):
        raise TypeError(
            f"scheduler {type(sched).__name__} lacks schedule_jnp(); the "
            "schedule must be traceable inside the jitted train step"
        )

    def schedule(step):
        return base_lr * sched.schedule_jnp(step)

    return schedule


def _optax_from_optimizer_config(optimizer_config, lr):
    """Map the YAML optimizer_config (torch.optim.* targets, reference
    diffusion.py:412-419) onto the equivalent optax transform.

    torch.optim.Adam's weight_decay is classic L2 folded into the gradient
    BEFORE the moment updates -> add_decayed_weights ahead of adam in the
    chain; torch.optim.AdamW decouples it -> optax.adamw.
    """
    cfg = optimizer_config or {"target": "torch.optim.AdamW"}
    target = cfg.get("target", "torch.optim.AdamW")
    p = dict(cfg.get("params", {}) or {})
    b1, b2 = p.pop("betas", (0.9, 0.999))
    eps = float(p.pop("eps", 1e-8))
    wd = p.pop("weight_decay", None)
    momentum = p.pop("momentum", None)
    p.pop("lr", None)  # the YAML base_learning_rate wins (reference behavior)
    name = target.rsplit(".", 1)[-1].lower()
    if p:
        raise ValueError(f"unsupported optimizer params for {target}: {sorted(p)}")
    if name == "adam":
        if momentum is not None:
            raise ValueError("torch.optim.Adam has no 'momentum' parameter")
        opt = optax.adam(lr, b1=b1, b2=b2, eps=eps)
        if wd:
            opt = optax.chain(optax.add_decayed_weights(float(wd)), opt)
        return opt
    if name == "adamw":
        if momentum is not None:
            raise ValueError("torch.optim.AdamW has no 'momentum' parameter")
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps,
                           weight_decay=0.01 if wd is None else float(wd))
    if name == "sgd":
        # torch.optim.SGD's weight_decay is classic L2 added to the gradient.
        opt = optax.sgd(lr, momentum=momentum)
        if wd:
            opt = optax.chain(optax.add_decayed_weights(float(wd)), opt)
        return opt
    raise ValueError(f"unsupported optimizer target {target!r}")


def make_optimizer(engine: DiffusionEngine, params, learning_rate: float,
                   schedule_fn=None,
                   accumulate_steps: int = 1) -> optax.GradientTransformation:
    """Optimizer from the engine's YAML optimizer_config (the shipped configs
    override the AdamW default to Adam) with non-trainable params masked out;
    gradient accumulation via MultiSteps (Lightning accumulate_grad_batches,
    main.py:950-955)."""
    mask = engine.trainable_mask(params)
    if schedule_fn is not None:
        lr = schedule_fn
    else:
        lr = learning_rate
    opt = _optax_from_optimizer_config(
        getattr(engine, "optimizer_config", None), lr)
    opt = optax.masked(opt, mask)
    if accumulate_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate_steps)
    return opt


def create_train_state(
    engine: DiffusionEngine,
    params,
    learning_rate: float,
    schedule_fn=None,
    accumulate_steps: int = 1,
) -> Tuple[TrainState, optax.GradientTransformation]:
    opt = make_optimizer(engine, params, learning_rate, schedule_fn,
                         accumulate_steps)

    # Build the state *inside* jit: eagerly-initialized buffers carry default
    # layouts that differ from the layouts the jitted train step emits, which
    # silently doubles the first compile (step 1 recompiles against the
    # donated outputs' layouts). A jitted init produces layout-stable buffers.
    @jax.jit
    def init_state(params):
        ema = (ema_init(params["model"], engine.ema_decay_rate)
               if engine.use_ema else None)
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32), ema=ema)

    return init_state(params), opt


def train_step(
    engine: DiffusionEngine,
    opt: optax.GradientTransformation,
    state: TrainState,
    batch: Dict,
    key: jax.Array,
) -> Tuple[TrainState, Dict]:
    """One optimization step; pure function of (state, batch, key)."""

    def loss_fn(params):
        per_sample = engine.loss(params, batch, key, global_step=state.step)
        return per_sample.mean()

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = (
        ema_update(state.ema, new_params["model"]) if state.ema is not None else None
    )
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "global_step": state.step,
    }
    return (
        TrainState(new_params, new_opt_state, state.step + 1, new_ema),
        metrics,
    )


def make_jitted_train_step(engine: DiffusionEngine, opt, mesh=None,
                           donate: bool = True):
    """Jit the step with output shardings pinned to the *input* state's
    shardings — otherwise step 0 returns jit-chosen shardings and step 1
    recompiles the whole program against the new layout.

    `mesh` is accepted for call-site symmetry but intentionally unused:
    placement comes entirely from the input state/batch shardings (GSPMD
    propagates them); pinning the step to a mesh would only mask
    mismatched placements instead of surfacing them."""
    step_fn = functools.partial(train_step, engine, opt)
    donate_args = (0,) if donate else ()
    cache = {}

    # Resolve the flash-backward kernel probe with a clean standalone
    # compile BEFORE the big grad trace: issued mid-trace through the
    # remote compile helper it can fail spuriously, and the cached failure
    # silently downgrades every grad program in this process to the
    # XLA-recompute backward (found by the round-5 hardened numerics gate).
    try:
        from gcd_tpu.ops.flash_attention import resolve_probes

        resolve_probes()
    except Exception:
        pass  # pure CPU runs without the kernel are fine

    def wrapper(state, batch, key):
        if "fn" not in cache:
            try:
                state_shardings = jax.tree_util.tree_map(
                    lambda x: x.sharding, state)
                cache["fn"] = jax.jit(
                    step_fn, donate_argnums=donate_args,
                    out_shardings=(state_shardings, None))
            except Exception:
                cache["fn"] = jax.jit(step_fn, donate_argnums=donate_args)
        # Trace the training step with the Pallas temporal-attention kernel
        # disabled (XLA path). History: round 2's toolchain crashed the
        # remote TPU compile helper (HTTP 500) when tattn + fused-MLP shared
        # one grad program; on the current toolchain that no longer
        # reproduces (scripts/repro_tattn_mlp_grad.py, and the full flagship
        # step compiles with the kernel forced on). The gate stays on
        # MEASURED grounds now: the full train step runs 396.0 ms/step with
        # tattn ON vs 383.3 ms/step gated (TPU v5e, bench.py GCD_BENCH_TRAIN)
        # — the kernel's recompute-style custom_vjp costs more in the grad
        # program than its forward saves. Thread-local override, so
        # concurrent eval/sampling traces on other threads keep the kernel;
        # the GCD_TATTN_PALLAS env var still takes precedence if a user
        # sets it.
        # subpix_upsample is likewise gated OFF in the grad program (see
        # dispatch.TRAIN_TRACE_FLAGS for both rationales).
        from gcd_tpu.ops.dispatch import TRAIN_TRACE_FLAGS, kernel_flags

        with kernel_flags(**TRAIN_TRACE_FLAGS):
            return cache["fn"](state, batch, key)

    return wrapper


def setup_sharded_training(
    engine: DiffusionEngine,
    params,
    learning_rate: float,
    mesh=None,
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    schedule_fn=None,
):
    """Place params/opt-state on the mesh and return (state, jitted step, mesh).

    The returned step expects batches placed via `shard_batch(batch, mesh)`
    (leading B*T axis over ("data","fsdp")). tensor > 1 adds Megatron-style
    tensor parallelism over the attention/MLP projections (mesh.py _tp_spec).
    """
    if mesh is None:
        mesh = create_mesh(data=data, fsdp=fsdp, tensor=tensor)
    param_shardings = make_param_shardings(params, mesh)
    params = jax.device_put(params, param_shardings)
    state, opt = create_train_state(engine, params, learning_rate, schedule_fn)
    step = make_jitted_train_step(engine, opt, mesh)
    return state, opt, step, mesh
