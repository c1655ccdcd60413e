"""Local HTTP serving front-end for the batched sampler.

POST /sample with an .npz body holding the per-clip batch arrays
(the SURVEY.md section 3.1 contract with a (T, ...) leading axis:
cond_frames, cond_frames_without_noise, cond_aug, motion_bucket_id, fps_id,
image_only_indicator (1, T), scaled_relative_angles or _pose) returns an
.npz body with the sample_video outputs (sampled_video et al). Concurrent
requests are batched onto one fixed-shape compiled program by
gcd_tpu/engine/server.py — the TPU-serving replacement for the reference's
one-process-per-GPU pooling (scripts/test.py:1050-1084).

Usage:
    python scripts/serve.py --config_path configs/infer_kubric.yaml \
        --model_path <ckpt> --port 8188 --max_batch 2 [--num_steps 25]

GET /healthz reports queue/batch counters.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_handler(server_obj, num_frames: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps({
                "ok": True,
                "num_frames": num_frames,
                "batches_run": server_obj.batches_run,
                "requests_served": server_obj.requests_served,
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/sample":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                data = np.load(io.BytesIO(self.rfile.read(n)),
                               allow_pickle=False)
                clip = {k: data[k] for k in data.files}
                clip["num_video_frames"] = num_frames
                out = server_obj.submit(clip).result(timeout=600)
                buf = io.BytesIO()
                np.savez_compressed(buf, **out)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-npz")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                msg = f"{type(e).__name__}: {e}".encode()
                self.send_response(500)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    return Handler


def main(argv=None):
    import jax

    from gcd_tpu.engine.server import SamplerServer, make_engine_sample_fn
    from scripts.eval_utils import load_model_bundle

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--port", type=int, default=8188)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--frame_width", type=int, default=384)
    p.add_argument("--frame_height", type=int, default=256)
    p.add_argument("--max_batch", type=int, default=2)
    p.add_argument("--max_wait_ms", type=float, default=50.0)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--decoding_t", type=int, default=None)
    p.add_argument("--artifact", default=None,
                   help="jax.export blob from scripts/export_artifact.py; "
                        "when present, boot from the AOT artifact (no "
                        "tracing/model re-instantiation — see "
                        "PERF_COLDSTART.json for what each mode costs)")
    args = p.parse_args(argv)

    # Persistent compilation cache: the cheapest cold-start fix for hosts
    # that re-boot the same program (scripts/bench_cold_start.py "cache").
    cache_dir = os.environ.get("GCD_JAX_CACHE")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # --artifact validation (ADVICE r3 #2): a typo'd path must not silently
    # fall back to the ~435 s cold-jit boot, and the sampling configuration
    # is BAKED INTO the exported program — num_steps/decoding_t cannot take
    # effect and silently diverging from the operator's request is worse
    # than refusing.
    if args.artifact:
        if not os.path.exists(args.artifact):
            p.error(f"--artifact {args.artifact!r} does not exist")
        if args.num_steps is not None or args.decoding_t is not None:
            p.error("--num_steps/--decoding_t cannot be combined with "
                    "--artifact: the exported program bakes them in "
                    "(re-export with scripts/export_artifact.py instead)")

    bundle = load_model_bundle(
        args.config_path, args.model_path, num_frames=args.num_frames,
        img_hw=(args.frame_height, args.frame_width))
    if args.artifact:
        from gcd_tpu.engine.export import load_sampler

        with open(args.artifact, "rb") as f:
            sample = load_sampler(f.read())

        def fn(batch, key, _params=bundle.params):
            arrays = {k: v for k, v in batch.items() if hasattr(v, "shape")}
            return sample(_params, arrays, key)
    else:
        fn = make_engine_sample_fn(
            bundle.engine, bundle.params, args.max_batch,
            args.num_frames, num_steps=args.num_steps,
            decoding_t=args.decoding_t)
    srv = SamplerServer(fn, args.num_frames, max_batch=args.max_batch,
                        max_wait_ms=args.max_wait_ms).start()

    # Warm the compile before accepting traffic.
    warm = bundle.engine.example_batch(
        (args.frame_height, args.frame_width), args.num_frames,
        args.max_batch)
    fn(warm, jax.random.PRNGKey(0))
    print(f"compiled (B={args.max_batch}, T={args.num_frames}); "
          f"serving on http://{args.host}:{args.port}", flush=True)

    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(srv, args.num_frames))
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
