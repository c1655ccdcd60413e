"""Device mesh + sharding rules — the TPU-native replacement for the
reference's Lightning DDP/NCCL layer (SURVEY.md section 2.8).

Design (per the scaling-book recipe): one `jax.sharding.Mesh` over ICI with
axes ("data", "fsdp").
  * The video batch shards its leading (B*T) axis over BOTH axes (pure data
    parallelism when fsdp=1).
  * Parameters shard their largest divisible axis over "fsdp" (ZeRO-3-style),
    replicated over "data"; XLA inserts all-gathers before use and
    reduce-scatters for gradients.
  * Gradient reduction over "data" is emitted automatically by pjit from the
    sharded-batch -> replicated-param contraction.

The reference trains one full replica per GPU (~50 GB) with DDP
(main.py:826-843); an fsdp axis lets the 1.5B-param UNet + Adam state fit
comfortably per chip and is the default for multi-chip meshes.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = -1,
    fsdp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "fsdp") mesh. data=-1 consumes the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % fsdp == 0, f"{n} devices not divisible by fsdp={fsdp}"
        data = n // fsdp
    assert data * fsdp == n, f"mesh {data}x{fsdp} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, fsdp)
    return Mesh(dev_array, ("data", "fsdp"))


def _choose_fsdp_dim(shape: Tuple[int, ...], fsdp_size: int,
                     min_weight_size: int) -> Optional[int]:
    """Pick the dimension to shard over fsdp: the largest dim divisible by the
    axis size, for params big enough to be worth the gather traffic."""
    if fsdp_size <= 1:
        return None
    if int(np.prod(shape)) < min_weight_size:
        return None
    best, best_size = None, 0
    for i, d in enumerate(shape):
        if d % fsdp_size == 0 and d > best_size:
            best, best_size = i, d
    return best


def make_param_shardings(params, mesh: Mesh, min_weight_size: int = 2**18):
    """NamedSharding tree for a param pytree: fsdp-shard the largest divisible
    axis of each big tensor, replicate the rest."""
    fsdp_size = mesh.shape["fsdp"]

    def per_leaf(leaf):
        shape = tuple(leaf.shape)
        dim = _choose_fsdp_dim(shape, fsdp_size, min_weight_size)
        if dim is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[dim] = "fsdp"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(per_leaf, params)


def make_batch_shardings(batch, mesh: Mesh):
    """Shard every array's leading axis over ("data", "fsdp") when divisible;
    replicate scalars/indivisible leaves."""
    total = mesh.shape["data"] * mesh.shape["fsdp"]

    def per_leaf(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] % total == 0:
            return NamedSharding(mesh, P(("data", "fsdp")))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(per_leaf, batch)


def shard_params(params, mesh: Mesh, min_weight_size: int = 2**18):
    shardings = make_param_shardings(params, mesh, min_weight_size)
    return jax.device_put(params, shardings), shardings


def shard_batch(batch, mesh: Mesh):
    shardings = make_batch_shardings(batch, mesh)
    return jax.device_put(batch, shardings), shardings
