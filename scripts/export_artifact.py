"""Export the compiled sampling program as a portable serving artifact.

Builds the engine from a config, loads (or randomly initializes) weights,
and serializes the whole `sample_video` pipeline with `jax.export`
(gcd_tpu/engine/export.py) for a fixed serving shape. The artifact plus a
checkpoint is all a serving host needs — no model code, no config system.

Usage:
    python scripts/export_artifact.py --config_path configs/infer_kubric.yaml \
        --model_path <ckpt-or-run-dir> --output sampler_384x256x14.jaxexp \
        [--num_steps 25] [--decoding_t 14] [--platforms tpu,cpu] [--random_init]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax

    from gcd_tpu.engine.export import export_sampler

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--frame_width", type=int, default=384)
    p.add_argument("--frame_height", type=int, default=256)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--batch", type=int, default=1,
                   help="clips per serving request (leading (B*T) axis)")
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--decoding_t", type=int, default=None)
    p.add_argument("--platforms", type=str, default=None,
                   help="comma list, e.g. 'tpu,cpu'; default current backend")
    p.add_argument("--random_init", action="store_true",
                   help="export with random weights (shape-only artifact; "
                        "weights are arguments so the blob is reusable)")
    args = p.parse_args(argv)

    from scripts.eval_utils import load_model_bundle

    if args.random_init:
        from gcd_tpu.utils.config import instantiate_from_config, load_config

        cfg = load_config(args.config_path)
        engine = instantiate_from_config(cfg["model"])
        params = jax.jit(
            lambda k: engine.init_params(
                k, img_hw=(args.frame_height, args.frame_width),
                t=args.num_frames)
        )(jax.random.PRNGKey(0))
    else:
        if not args.model_path:
            p.error("--model_path is required without --random_init")
        bundle = load_model_bundle(args.config_path, args.model_path)
        engine, params = bundle.engine, bundle.params

    batch = engine.example_batch(
        (args.frame_height, args.frame_width), args.num_frames, args.batch)
    platforms = args.platforms.split(",") if args.platforms else None
    blob = export_sampler(engine, params, batch,
                          num_steps=args.num_steps,
                          decoding_t=args.decoding_t, platforms=platforms)
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"wrote {args.output}: {len(blob) / 1e6:.2f} MB "
          f"(shapes: B={args.batch} T={args.num_frames} "
          f"{args.frame_height}x{args.frame_width})")


if __name__ == "__main__":
    main()
