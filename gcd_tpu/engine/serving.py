"""Multi-chip serving: data-parallel sharded sampling over a device mesh.

The reference parallelizes inference by replicating the model per GPU and
sharding *examples* across processes (scripts/test.py:1050-1084). TPU-native
serving instead shards ONE clip's work across the mesh: every array in the
batch splits its leading (B*T) axis over the ("data","fsdp") axes and the
whole `sample_video` program (conditioner -> 25-step scan -> VAE decode) runs
SPMD, with XLA inserting the collectives the temporal layers need (frames
talk to each other through temporal attention/convs, so a bt-sharded clip
incurs all-gathers there — still a large latency win per chip added).

Params are replicated by default (inference has no optimizer state; a 1.5B
bf16 UNet fits a single v5e); pass `param_shardings` to run FSDP-style
sharded-weights inference instead (weights gathered per layer on the fly).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from gcd_tpu.parallel.mesh import shard_batch


def make_sharded_sampler(engine, mesh, num_steps: Optional[int] = None,
                         decoding_t: Optional[int] = None,
                         param_shardings=None, return_latents: bool = False):
    """Returns sample(params, batch, key) -> dict, jitted over `mesh`.

    The returned callable device_puts the batch with leading-axis sharding
    (replicating indivisible leaves) and the params replicated (or per
    `param_shardings`), then runs engine.sample_video SPMD. Outputs come back
    fully replicated for host-side consumption — including the sampled
    latents when requested (the latent-PCA gallery needs them; they are tiny
    next to the decoded frames, so replication costs nothing measurable).
    """
    from gcd_tpu.ops.dispatch import default_compiler_options

    replicate = NamedSharding(mesh, P())

    @functools.partial(jax.jit, out_shardings=replicate,
                       compiler_options=default_compiler_options())
    def _sample(params, batch: Dict, key):
        return engine.sample_video(params, batch, key, num_steps=num_steps,
                                   decoding_t=decoding_t,
                                   return_latents=return_latents)

    def sample(params, batch: Dict, key):
        # Only array leaves enter the jitted program; scalar entries like
        # num_video_frames are dropped (sample_video derives the frame count
        # from image_only_indicator's static shape).
        batch_sh, _ = shard_batch(
            {k: v for k, v in batch.items() if hasattr(v, "shape")}, mesh)
        params_sh = jax.device_put(
            params, param_shardings if param_shardings is not None else replicate)
        return _sample(params_sh, batch_sh, key)

    return sample
