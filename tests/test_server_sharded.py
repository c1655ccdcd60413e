"""SamplerServer composed with the SPMD sharded sampler: the batching loop
feeds the mesh-parallel program, so serving scales over chips while clients
still submit one clip at a time (8-device virtual CPU mesh)."""

import jax
import numpy as np
import pytest

from gcd_tpu.engine.server import SamplerServer
from gcd_tpu.engine.serving import make_sharded_sampler
from gcd_tpu.parallel.mesh import create_mesh
from gcd_tpu.utils.config import instantiate_from_config
from tests.helpers import tiny_engine_config

T, H, W = 2, 32, 48
MAX_BATCH = 4  # MAX_BATCH * T = 8 rows -> divisible by the 8-device mesh


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_engine_config()
    cfg["params"]["sampler_config"]["params"]["guider_config"]["params"][
        "num_frames"
    ] = T
    engine = instantiate_from_config(cfg)
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(H, W), t=T))(
        jax.random.PRNGKey(0))
    mesh = create_mesh(data=4, fsdp=2)
    sharded = make_sharded_sampler(engine, mesh, num_steps=2)

    def sample_fn(batch, key):
        return sharded(params, batch, key)

    return engine, params, sample_fn


def test_make_sampler_tensor_parallel_wiring(setup):
    """eval_utils.make_sampler(mesh_tensor>1) must build the 3-axis mesh with
    Megatron param shardings and produce finite output for one clip whose
    B*T doesn't divide the mesh (batch sharding alone would replicate)."""
    from scripts import eval_utils

    engine, params, _ = setup

    class Bundle:
        pass

    b = Bundle()
    b.engine, b.params = engine, params
    sample = eval_utils.make_sampler(b, mesh_data=1, mesh_fsdp=2,
                                     mesh_tensor=4, decoding_t=T)
    clip = engine.example_batch((H, W), T, 1)  # B*T = 2, mesh = 8 devices
    clip["cond_frames_without_noise"] = jax.random.normal(
        jax.random.PRNGKey(7), (T, H, W, 3)) * 0.2
    clip["cond_frames"] = clip["cond_frames_without_noise"] + 0.01
    out = sample(clip, jax.random.PRNGKey(0))
    v = np.asarray(out["sampled_video"])
    assert v.shape == (T, H, W, 3) and np.isfinite(v).all()


def test_server_over_mesh_matches_direct(setup):
    engine, params, sample_fn = setup
    srv = SamplerServer(sample_fn, T, max_batch=MAX_BATCH,
                        max_wait_ms=500).start()
    try:
        clips, futs = [], []
        for i in range(MAX_BATCH):
            clip = engine.example_batch((H, W), T, 1)
            noise = jax.random.normal(
                jax.random.PRNGKey(50 + i), (T, H, W, 3)) * 0.2
            clip["cond_frames_without_noise"] = noise
            clip["cond_frames"] = noise + 0.01
            clips.append(clip)
            futs.append(srv.submit(clip, jax.random.PRNGKey(i)))
        outs = [f.result(timeout=600) for f in futs]
    finally:
        srv.stop()
    assert srv.batches_run == 1 and srv.requests_served == MAX_BATCH
    for out in outs:
        assert out["sampled_video"].shape == (T, H, W, 3)
        assert np.isfinite(out["sampled_video"]).all()
    assert not np.allclose(outs[0]["sampled_video"], outs[1]["sampled_video"])
