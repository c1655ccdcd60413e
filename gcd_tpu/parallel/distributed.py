"""Multi-process (multi-host) SPMD support.

The reference trains multi-node through Lightning DDP's `--num_nodes` flag
(gcd-model/main.py:917-918) with ad-hoc `MULTINODE_HACKS` (main.py:41,
294-297). The TPU-native equivalent: every process joins one
`jax.distributed` cluster, the ("data","fsdp"[,"tensor"]) mesh spans ALL
processes' devices (a v5p pod slice is multi-host by definition), and each
host feeds only its own slice of the global batch —
`jax.make_array_from_process_local_data` assembles the global arrays, and
pjit/GSPMD emits the cross-host collectives over ICI/DCN exactly as it does
single-host over ICI.

Conventions (mirrored by main.py and tests/test_multiprocess.py):
  * The config `batch_size` stays the GLOBAL batch: process p loads rows
    [p*B/P, (p+1)*B/P) of every global batch (data/loader.py process_shard),
    so a P-process run consumes the identical example stream as the
    single-process run and the loss matches bit-for-bit.
  * Logging / config snapshots / metrics CSV are process-0-only; orbax
    checkpoint save/restore runs on ALL processes (orbax coordinates the
    per-host shard writes through the jax distributed client).
  * Image logging is process-0-only output but would require an all-process
    collective sampling program; main.py disables it for multi-process runs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_cpu_devices: int = 0) -> None:
    """Join the jax distributed cluster. Call BEFORE any device query.

    Modes:
      * num_processes in (None, 0, 1): single-process — no-op.
      * num_processes == -1: auto-detect (TPU pods export the coordinator
        through the runtime environment; `jax.distributed.initialize()` with
        no arguments reads it).
      * otherwise: explicit (coordinator, num_processes, process_id) — the
        CPU-cluster test configuration and bare-metal TPU hosts.

    local_cpu_devices > 0 additionally forces the CPU platform with that many
    virtual local devices (multi-process validation without TPU hardware).
    """
    global _initialized
    if local_cpu_devices > 0:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", local_cpu_devices)
    if num_processes in (None, 0, 1):
        return
    if num_processes == -1:
        jax.distributed.initialize()
    else:
        if coordinator is None or process_id is None:
            raise ValueError(
                "explicit multi-process mode needs --coordinator host:port "
                "and --process_id")
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=int(num_processes),
                                   process_id=int(process_id))
    _initialized = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main() -> bool:
    return jax.process_index() == 0


def local_scalar(x) -> float:
    """Read a replicated scalar from a (possibly multi-process) jax.Array.

    `float(x)` raises on arrays that are not fully addressable from this
    process; every process holds a replica of replicated outputs, so the
    first addressable shard IS the value.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return float(np.asarray(x.addressable_data(0)))
    return float(x)


def broadcast_str(s: str, max_len: int = 256) -> str:
    """Agree on a string cluster-wide (process 0 wins) — used for the
    timestamped run name, which would otherwise diverge across hosts."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    buf = np.zeros((max_len,), np.uint8)
    raw = s.encode()[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out[out != 0]).decode()


def make_global_batch(local_batch: Dict, mesh: Mesh) -> Dict:
    """Assemble global jax.Arrays from this process's local batch slice.

    Mirrors mesh.make_batch_shardings' rule on GLOBAL shapes: a leaf whose
    global leading axis (local * process_count) divides the mesh size shards
    over ("data","fsdp"); everything else is treated as replicated, which
    requires the local values to be process-identical (true for the
    per-video-constant keys: num_video_frames etc.).
    """
    nproc = jax.process_count()
    total = mesh.shape["data"] * mesh.shape["fsdp"]

    def per_leaf(leaf):
        if not hasattr(leaf, "shape"):
            return leaf  # python scalars (num_video_frames) pass through
        arr = np.asarray(leaf)
        if arr.ndim >= 1 and (arr.shape[0] * nproc) % total == 0:
            sh = NamedSharding(mesh, P(("data", "fsdp")))
            return jax.make_array_from_process_local_data(sh, arr)
        sh = NamedSharding(mesh, P())
        return jax.make_array_from_process_local_data(sh, arr)

    return {k: per_leaf(v) for k, v in local_batch.items()}


def put_host_tree(tree, shardings):
    """Place a host-replicated pytree (every process holds the FULL value,
    e.g. a torch-checkpoint ingest) onto cross-process shardings.

    `jax.device_put` cannot target non-addressable devices;
    `make_array_from_callback` asks each process only for the slices its
    local devices own.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def per_leaf(x, sh):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    return jax.tree_util.tree_map(per_leaf, tree, shardings)


def gather_tree_to_host(tree, mesh: Mesh):
    """Fetch a (possibly cross-process-sharded) pytree to host numpy on
    EVERY process.

    A COLLECTIVE: all processes must call it together. One jitted identity
    program with fully-replicated out_shardings makes GSPMD emit the
    all-gathers; the resulting arrays are fully addressable everywhere, so
    np.asarray is a local read. Used by the multi-process ImageLogger path
    (reference logs train samples on rank 0 under DDP, gcd-model/
    main.py:323-555): after the gather, process 0 can run a process-LOCAL
    sampling program without deadlocking the cluster on FSDP collectives.
    """
    repl = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: repl, tree)
    full = jax.jit(lambda t: t, out_shardings=shardings)(tree)
    return jax.tree_util.tree_map(lambda a: np.asarray(a), full)


def local_process_rows(global_rows: int) -> Tuple[int, int]:
    """[start, stop) of the global leading axis owned by this process under
    the contiguous process-major device order produced by create_mesh over
    jax.devices()."""
    nproc, pid = jax.process_count(), jax.process_index()
    assert global_rows % nproc == 0, (global_rows, nproc)
    per = global_rows // nproc
    return pid * per, (pid + 1) * per
