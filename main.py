"""Training driver CLI.

Behavioral reference: gcd-model/main.py (:583-999): `python main.py --base
cfg.yaml [--train] [k=v ...]` with left-to-right config merge + dotlist
overrides, logdir setup with config snapshots, checkpoint-every-N-steps +
save_last, image logging, LR scaling, SIGUSR1 checkpoint-on-signal and
checkpoint-on-exception ("melk").

The Lightning Trainer + DDPStrategy is replaced by a jitted SPMD train step
over a ("data","fsdp") jax mesh (gcd_tpu.engine.trainer); the dedicated
point-cloud data GPU becomes host-side threaded rendering (gcd_tpu.data).
"""

from __future__ import annotations

import argparse
import csv
import datetime
import glob
import os
import signal
import sys
import time

import numpy as np


def get_parser():
    parser = argparse.ArgumentParser(description="gcd_tpu trainer")
    parser.add_argument("-n", "--name", type=str, default="")
    parser.add_argument("-r", "--resume", type=str, default="")
    parser.add_argument("-b", "--base", nargs="*", default=[])
    parser.add_argument("-t", "--train", action="store_true", default=True)
    parser.add_argument("--no-test", action="store_true", default=True)
    parser.add_argument("-s", "--seed", type=int, default=23)
    parser.add_argument("-l", "--logdir", type=str, default="logs")
    parser.add_argument("--scale_lr", action="store_true", default=False)
    parser.add_argument("--resume_from_checkpoint", type=str, default="")
    parser.add_argument("--max_steps", type=int, default=-1)
    parser.add_argument("--mesh_fsdp", type=int, default=1)
    parser.add_argument("--mesh_tensor", type=int, default=1,
                        help="Megatron-style tensor-parallel axis size over "
                        "the attention/MLP projections (parallel/mesh.py)")
    parser.add_argument("--wandb", action="store_true", default=False)
    parser.add_argument("--projectname", type=str, default="gcd_tpu")
    parser.add_argument("--no_date", action="store_true", default=False)
    parser.add_argument("--enable_tf32", action="store_true", default=True)
    parser.add_argument(
        "--cpu_devices", type=int, default=0,
        help="Force N virtual CPU devices (XLA_FLAGS is clobbered by the host "
             "sitecustomize, so this goes through jax.config)")
    # Multi-process (multi-host) SPMD — the TPU-native --num_nodes
    # (gcd-model/main.py:917-918; gcd_tpu/parallel/distributed.py). Every
    # process runs this same CLI; the mesh spans all processes' devices and
    # each process feeds its slice of the global batch.
    parser.add_argument(
        "--coordinator", type=str, default="",
        help="host:port of process 0 for jax.distributed.initialize")
    parser.add_argument(
        "--num_processes", type=int, default=0,
        help="0 = single-process (default); -1 = auto-detect from the TPU "
             "pod runtime; N>1 = explicit cluster of N processes")
    parser.add_argument("--process_id", type=int, default=0)
    parser.add_argument(
        "--profile_steps", type=int, default=0,
        help="Capture a jax profiler trace (xplane) of steps 2..2+N under "
             "<logdir>/profile — the rebuild's answer to SURVEY.md section-5's "
             "missing tracing subsystem")
    return parser


class CSVLogger:
    """Default metrics logger (reference falls back to CSV when wandb is off,
    main.py:760-801)."""

    def __init__(self, logdir):
        self.path = os.path.join(logdir, "metrics.csv")
        self._file = open(self.path, "a", newline="")
        self._writer = None

    def log(self, metrics: dict):
        if self._writer is None:
            self._writer = csv.DictWriter(self._file, fieldnames=list(metrics))
            if self._file.tell() == 0:
                self._writer.writeheader()
        self._writer.writerow(metrics)
        self._file.flush()


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from gcd_tpu.utils.config import (
        load_config, merge_configs, apply_dotlist, save_config,
        instantiate_from_config, get_by_path,
    )
    from gcd_tpu.engine.trainer import (
        create_train_state, make_jitted_train_step, make_schedule_fn,
    )
    from gcd_tpu.engine.image_logger import ImageLogger
    from gcd_tpu.parallel.mesh import (
        create_mesh, make_param_shardings, shard_params, shard_batch,
    )
    from gcd_tpu.parallel import distributed
    from gcd_tpu.io.checkpoint import (
        save_checkpoint, restore_checkpoint, latest_step, find_resume_logdir,
    )

    if os.environ.get("GCD_DEBUG_HANG"):
        import faulthandler

        faulthandler.dump_traceback_later(
            int(os.environ.get("GCD_DEBUG_HANG")), repeat=True)

    parser = get_parser()
    opt, unknown = parser.parse_known_args(argv)
    if opt.cpu_devices > 0:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", opt.cpu_devices)
    # Persistent compile cache is opt-in: on this host, cache entries written
    # by the axon remote-compile helper carry a different CPU-feature profile
    # (+prefer-no-scatter/-gather); loading them stalls XLA:CPU execution
    # forever (observed as a permanent hang in the first device-to-host
    # transfer). Set GCD_JAX_CACHE to a dedicated directory to enable.
    cache_dir = os.environ.get("GCD_JAX_CACHE")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Join the multi-host cluster before any device query (no-op for
    # single-process runs).
    distributed.initialize(opt.coordinator or None, opt.num_processes,
                           opt.process_id)
    nproc = distributed.process_count()
    is_main_proc = distributed.is_main()

    def mprint(*args, **kwargs):
        if is_main_proc:
            print(*args, **kwargs)

    # ---- config assembly (main.py:637-753) -------------------------------
    if opt.resume:
        logdir = find_resume_logdir(opt.resume)
        base_configs = sorted(glob.glob(os.path.join(logdir, "configs", "*.yaml")))
        opt.base = base_configs + opt.base
        nowname = os.path.basename(logdir)
    else:
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        cfg_name = (os.path.splitext(os.path.basename(opt.base[0]))[0]
                    if opt.base else "none")
        name = opt.name or cfg_name
        nowname = name if opt.no_date else f"{now}_{name}"
        # All processes must agree on the (timestamped) run directory.
        nowname = distributed.broadcast_str(nowname)
        logdir = os.path.join(opt.logdir, nowname)

    configs = [load_config(fp) for fp in opt.base]
    config = merge_configs(configs)
    config = apply_dotlist(config, [u for u in unknown if "=" in u])

    ckptdir = os.path.join(logdir, "checkpoints")
    cfgdir = os.path.join(logdir, "configs")
    os.makedirs(ckptdir, exist_ok=True)
    os.makedirs(cfgdir, exist_ok=True)
    if is_main_proc:
        save_config(config, os.path.join(
            cfgdir, f"{datetime.datetime.now():%Y-%m-%dT%H-%M-%S}-project.yaml"))

    np.random.seed(opt.seed)
    key = jax.random.PRNGKey(opt.seed)

    # ---- model -----------------------------------------------------------
    model_cfg = dict(config["model"])
    base_lr = float(model_cfg.get("base_learning_rate", 2e-5))
    engine = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})

    data_cfg = config["data"]
    data_module = instantiate_from_config(data_cfg)
    loader = data_module.train_dataloader()
    if nproc > 1:
        # Multi-host feeding: config batch_size stays the GLOBAL batch;
        # this process loads/renders only its contiguous row slice
        # (data/loader.py process_shard).
        loader.process_shard = (distributed.process_index(), nproc)

    frame_h = int(get_by_path(config, "data.params.frame_height", 256))
    frame_w = int(get_by_path(config, "data.params.frame_width", 384))
    t = int(get_by_path(config, "data.params.model_frames", 14))
    batch_size = int(get_by_path(config, "data.params.batch_size", 1))

    lightning_cfg = config.get("lightning", {})
    trainer_cfg = lightning_cfg.get("trainer", {})
    accumulate = int(trainer_cfg.get("accumulate_grad_batches", 1))
    max_epochs = int(trainer_cfg.get("max_epochs", 300))
    ckpt_every = int(get_by_path(
        lightning_cfg, "modelcheckpoint.params.every_n_train_steps", 1250))
    img_logger_cfg = get_by_path(
        lightning_cfg, "callbacks.image_logger.params", {}) or {}
    image_logger = ImageLogger(logdir, **{
        k: v for k, v in img_logger_cfg.items()
        if k in ("batch_frequency", "max_images", "disabled", "log_first_step")
    })
    # Multi-process image logging (reference: rank-0 ImageLogger under DDP,
    # gcd-model/main.py:323-555): sampling straight from the FSDP-sharded
    # params on process 0 alone would deadlock the cluster on collectives,
    # so at log steps ALL processes gather the params to host
    # (distributed.gather_tree_to_host, a collective) and process 0 runs a
    # process-local sampling program over the gathered copy.
    # WandbLogger when requested + importable, CSV fallback (main.py:760-801).
    # Metrics are identical on every process (replicated outputs): process 0
    # is the only writer.
    csv_logger = CSVLogger(logdir) if is_main_proc else None
    wandb_run = None
    if opt.wandb and is_main_proc:
        try:
            import wandb

            wandb_run = wandb.init(project=opt.projectname, name=nowname,
                                   dir=logdir, config=config)
        except ImportError:
            print("wandb requested but not installed; using CSV logger only")

    def log_metrics(metrics: dict):
        if csv_logger is not None:
            csv_logger.log(metrics)
        if wandb_run is not None:
            wandb_run.log(metrics, step=metrics.get("step"))

    # ---- LR scaling (main.py:956-966) ------------------------------------
    n_devices = len(jax.devices())
    if opt.scale_lr:
        lr = accumulate * n_devices * batch_size * base_lr
        print(f"Scaling LR to {lr:.2e} = {accumulate} x {n_devices} x "
              f"{batch_size} x {base_lr:.2e}")
    else:
        lr = base_lr

    # ---- params ----------------------------------------------------------
    mprint(f"Initializing parameters ({frame_h}x{frame_w}, T={t})...")
    # Every process initializes the identical full replica from the shared
    # key (local devices only), torch-ckpt ingest overwrites it from the
    # shared filesystem, and placement onto the (possibly cross-process)
    # mesh happens once at the end.
    params = jax.jit(
        lambda k: engine.init_params(k, img_hw=(frame_h, frame_w), t=t)
    )(key)

    ckpt_path = model_cfg["params"].get("ckpt_path")
    if opt.resume_from_checkpoint:
        ckpt_path = opt.resume_from_checkpoint
    if ckpt_path and os.path.exists(str(ckpt_path)):
        mprint(f"Loading torch checkpoint {ckpt_path}...")
        params = engine.load_torch_checkpoint(str(ckpt_path), params,
                                              verbose=is_main_proc)

    mesh = create_mesh(data=-1, fsdp=opt.mesh_fsdp, tensor=opt.mesh_tensor)
    mprint(f"Mesh: {dict(mesh.shape)} over {n_devices} devices, "
           f"{nproc} process(es)")
    if nproc > 1:
        params = jax.tree_util.tree_map(np.asarray, params)
        params = distributed.put_host_tree(
            params, make_param_shardings(params, mesh))
    else:
        params = jax.tree_util.tree_map(jnp.asarray, params)
        params, _ = shard_params(params, mesh)

    # scheduler_config -> optax schedule (reference diffusion.py:420-430);
    # None keeps constant LR. The optimizer itself (Adam vs AdamW etc.)
    # comes from the engine's optimizer_config inside make_optimizer.
    schedule_fn = make_schedule_fn(
        getattr(engine, "scheduler_config", None), lr)
    state, optimizer = create_train_state(
        engine, params, lr, schedule_fn=schedule_fn,
        accumulate_steps=accumulate)
    step_fn = make_jitted_train_step(engine, optimizer, mesh)

    start_step = 0
    resume_step = latest_step(ckptdir)
    if opt.resume and resume_step is not None:
        mprint(f"Resuming from {ckptdir} step {resume_step}")
        restored = restore_checkpoint(ckptdir, resume_step, target={
            "params": state.params, "opt_state": state.opt_state,
            "step": state.step, "ema": state.ema,
        })
        state = type(state)(**restored)
        start_step = int(resume_step)

    # ---- melk: checkpoint on signal/exception (main.py:969-997) ----------
    def melk(*args):
        print("Saving checkpoint on interrupt/exception (melk)...")
        save_checkpoint(ckptdir, int(distributed.local_scalar(state.step)), {
            "params": state.params, "opt_state": state.opt_state,
            "step": state.step, "ema": state.ema,
        })
        if args:
            sys.exit(1)

    signal.signal(signal.SIGUSR1, melk)

    # ---- train loop ------------------------------------------------------
    global_step = start_step
    max_steps = opt.max_steps if opt.max_steps > 0 else None
    mprint(f"Training from step {global_step} (ckpt every {ckpt_every})...")
    try:
        done = False
        for epoch in range(max_epochs):
            if done:
                break
            for batch_np in loader:
                if opt.profile_steps > 0 and global_step == 2:
                    jax.profiler.start_trace(os.path.join(logdir, "profile"))
                if opt.profile_steps > 0 and global_step == 2 + opt.profile_steps:
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {logdir}/profile")
                    opt.profile_steps = 0
                step_t0 = time.time()
                if nproc > 1:
                    batch = distributed.make_global_batch(batch_np, mesh)
                else:
                    batch = {
                        k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                        for k, v in batch_np.items()
                    }
                    batch, _ = shard_batch(batch, mesh)
                step_key = jax.random.fold_in(key, global_step)
                state, metrics = step_fn(state, batch, step_key)
                global_step = int(distributed.local_scalar(state.step))

                loss = distributed.local_scalar(metrics["loss"])
                if is_main_proc and (global_step % 10 == 0 or global_step <= 5):
                    dt = time.time() - step_t0
                    print(f"step {global_step} epoch {epoch} "
                          f"loss {loss:.4f} ({dt:.2f}s/it)")
                cur_lr = (float(schedule_fn(global_step))
                          if schedule_fn is not None else lr)
                log_metrics({
                    "step": global_step, "epoch": epoch, "loss": loss,
                    "grad_norm": distributed.local_scalar(metrics["grad_norm"]),
                    "lr": cur_lr,
                })

                if image_logger.should_log(global_step):
                    try:
                        log_key = jax.random.fold_in(key, 2**30 + global_step)
                        if nproc > 1:
                            # Collective on every process; write on 0 only.
                            host_params = distributed.gather_tree_to_host(
                                state.params, mesh)
                            if is_main_proc:
                                image_logger.log(engine, host_params,
                                                 batch_np, global_step,
                                                 log_key)
                                print(f"image log written at step "
                                      f"{global_step} (process 0)")
                        else:
                            image_logger.log(engine, state.params, batch_np,
                                             global_step, log_key)
                    except Exception as e:
                        print(f"image logging failed: {e}")

                if global_step % ckpt_every == 0:
                    save_checkpoint(ckptdir, global_step, {
                        "params": state.params, "opt_state": state.opt_state,
                        "step": state.step, "ema": state.ema,
                    })

                if max_steps is not None and global_step >= max_steps:
                    done = True
                    break
    except Exception:
        melk()
        raise

    save_checkpoint(ckptdir, global_step, {
        "params": state.params, "opt_state": state.opt_state,
        "step": state.step, "ema": state.ema,
    })
    mprint(f"Training finished at step {global_step}; logdir: {logdir}")
    return logdir


if __name__ == "__main__":
    main()
