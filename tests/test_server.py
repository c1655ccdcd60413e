"""Batched sampler server (engine/server.py) + HTTP front-end (scripts/serve.py).

Runs the tiny full-stack engine: concurrent submits must be packed into
fixed-shape batches, results must match direct single-clip sample_video
calls with the same keys, and the padded tail of a partial batch must not
leak into results."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcd_tpu.engine.server import (SamplerServer, _concat_requests,
                                   make_engine_sample_fn)
from gcd_tpu.utils.config import instantiate_from_config
from tests.helpers import tiny_engine_config

B, T, H, W = 1, 3, 32, 48
MAX_BATCH = 2


@pytest.fixture(scope="module")
def engine():
    return instantiate_from_config(tiny_engine_config())


@pytest.fixture(scope="module")
def setup(engine):
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(H, W), t=T))(
        jax.random.PRNGKey(0))
    fn = make_engine_sample_fn(engine, params, MAX_BATCH, T, num_steps=2,
                               decoding_t=T)
    return params, fn


def _clip(engine, seed):
    batch = engine.example_batch((H, W), T, 1)
    key = jax.random.PRNGKey(100 + seed)
    batch["cond_frames"] = jax.random.normal(key, (T, H, W, 3)) * 0.1
    batch["cond_frames_without_noise"] = batch["cond_frames"]
    return batch


def test_concat_requests_pads_and_stacks(engine):
    clips = [_clip(engine, 0)]
    out = _concat_requests(clips, 3)
    assert out["cond_frames"].shape == (3 * T, H, W, 3)
    assert out["image_only_indicator"].shape == (3, T)
    assert out["num_video_frames"] == T
    # padding replicates the last clip
    np.testing.assert_array_equal(np.asarray(out["cond_frames"][:T]),
                                  np.asarray(out["cond_frames"][T:2 * T]))


def test_server_batches_concurrent_requests(engine, setup):
    _, fn = setup
    srv = SamplerServer(fn, T, max_batch=MAX_BATCH, max_wait_ms=500).start()
    try:
        futs = [srv.submit(_clip(engine, i), jax.random.PRNGKey(i))
                for i in range(4)]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        srv.stop()
    assert srv.requests_served == 4
    # 4 requests over max_batch=2 -> exactly 2 program runs
    assert srv.batches_run == 2
    for out in outs:
        assert out["sampled_video"].shape == (T, H, W, 3)
        assert np.isfinite(out["sampled_video"]).all()
    # different conditioning -> different outputs
    assert not np.allclose(outs[0]["sampled_video"], outs[3]["sampled_video"])


def test_partial_batch_padding_is_dropped(engine, setup):
    _, fn = setup
    srv = SamplerServer(fn, T, max_batch=MAX_BATCH, max_wait_ms=10).start()
    try:
        out = srv.submit(_clip(engine, 7)).result(timeout=300)
    finally:
        srv.stop()
    assert out["sampled_video"].shape == (T, H, W, 3)
    assert srv.batches_run == 1 and srv.requests_served == 1


def test_wrong_num_frames_rejected(engine, setup):
    _, fn = setup
    srv = SamplerServer(fn, T, max_batch=MAX_BATCH).start()
    try:
        bad = engine.example_batch((H, W), T + 1, 1)
        with pytest.raises(ValueError):
            srv.submit(bad)
    finally:
        srv.stop()


def test_stop_fails_pending_and_rejects_new_submits(engine, setup):
    """Requests racing shutdown must fail fast, not hang on unresolved
    futures; submits after stop() must be rejected outright."""
    _, fn = setup
    srv = SamplerServer(fn, T, max_batch=MAX_BATCH, max_wait_ms=10)
    # never started: anything queued must still be failed by stop()
    fut = srv.submit(_clip(engine, 0))
    srv.stop(timeout=1.0)
    with pytest.raises(RuntimeError):
        fut.result(timeout=5.0)
    with pytest.raises(RuntimeError):
        srv.submit(_clip(engine, 1))


def test_http_front_end(engine, setup):
    import http.client
    import io as _io
    from http.server import ThreadingHTTPServer

    import scripts.serve as serve_mod

    _, fn = setup
    srv = SamplerServer(fn, T, max_batch=MAX_BATCH, max_wait_ms=10).start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.make_handler(srv, T))
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    port = httpd.server_address[1]
    try:
        clip = _clip(engine, 3)
        buf = _io.BytesIO()
        np.savez_compressed(buf, **{
            k: np.asarray(v) for k, v in clip.items()
            if k != "num_video_frames"})
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/sample", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()[:500]
        out = np.load(_io.BytesIO(resp.read()))
        assert out["sampled_video"].shape == (T, H, W, 3)

        conn.request("GET", "/healthz")
        h = conn.getresponse()
        assert h.status == 200
        import json
        stats = json.loads(h.read())
        assert stats["requests_served"] >= 1
    finally:
        httpd.shutdown()
        srv.stop()


def test_program_policy_applied_at_server_trace(engine):
    """The batch-4 layout policy (dispatch.program_flag_overrides) must reach
    the server's jitted program: at max_batch=4 x 14 frames (CFG-doubled
    extent 112, the measured PERF_BATCH pathology) the trace must see
    gn_stats_pallas=True; at other extents it must see no override.
    Probed by recording the thread-local flag at trace time.

    On this CPU suite default_compiler_options() is None, so the no-bundle
    branch of the round-5 refined policy applies — which is also what a
    TPU server compiled without the bundle option gets; the bundle branch
    is covered by test_dispatch.test_program_policy_bundle_refinement."""
    from gcd_tpu.ops import dispatch

    seen = {}

    class ProbeEngine:
        def sample_video(self, p, batch, key, num_steps=None,
                         decoding_t=None):
            seen["flag"] = dispatch.kernel_setting("gn_stats_pallas")
            return {"sampled_video": jnp.zeros((1,))}

    fn = make_engine_sample_fn(ProbeEngine(), {}, max_batch=4, num_frames=14)
    fn({}, jax.random.PRNGKey(0))
    assert seen["flag"] is True, (
        "server trace at bt=112 did not pick up gn_stats_pallas")

    seen.clear()
    fn = make_engine_sample_fn(ProbeEngine(), {}, max_batch=2, num_frames=3)
    fn({}, jax.random.PRNGKey(0))
    assert seen["flag"] is None


def test_program_policy_applied_at_export_trace(engine):
    """export_sampler must apply the same policy while tracing the artifact
    (an exported batched program is baked permanently)."""
    from gcd_tpu.engine import export as export_mod
    from gcd_tpu.ops import dispatch

    seen = {}

    class ProbeEngine:
        def sample_video(self, p, batch, key, num_steps=None,
                         decoding_t=None):
            seen["flag"] = dispatch.kernel_setting("gn_stats_pallas")
            return {"sampled_video": jnp.zeros((1,))}

    # 56 frame-rows => 4 clips x 14 frames => CFG-doubled extent 112.
    batch = {"cond_frames": jnp.zeros((56, 8, 8, 3)),
             "num_video_frames": 14}
    export_mod.export_sampler(ProbeEngine(), {"w": jnp.zeros((1,))}, batch)
    assert seen["flag"] is True, (
        "export trace at bt=112 did not pick up gn_stats_pallas")
