"""Inference on arbitrary videos/images (no ground truth).

Behavioral reference: gcd-model/scripts/infer.py — per-input batch construction
via eval_utils.construct_batch, N samples of sample_video, diversity-only
metrics (:185-211), visualizations and mp4/png/json outputs (:237-452).
Multi-GPU mp.Pool sharding becomes sequential (or --shard i/n) on TPU: the
sampler is one jitted program per clip, so process parallelism buys nothing
on a single chip.

Usage:
    python scripts/infer.py --config_path configs/infer_kubric.yaml \
        --model_path <ckpt> --input <video|image|dir|list.txt> \
        --output <dir> --azimuth 30 --elevation 15 --radius -1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import eval_utils
from gcd_tpu.data import common
from gcd_tpu.utils.metrics import sample_diversity


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output", type=str, default="eval_output/infer")
    p.add_argument("--num_samples", type=int, default=2)
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--frame_width", type=int, default=384)
    p.add_argument("--frame_height", type=int, default=256)
    p.add_argument("--frame_offset", type=int, default=0)
    p.add_argument("--frame_stride", type=int, default=1)
    p.add_argument("--frame_rate", type=int, default=12)
    p.add_argument("--input_frames", type=int, default=14)
    p.add_argument("--azimuth", type=float, default=30.0)
    p.add_argument("--elevation", type=float, default=15.0)
    p.add_argument("--radius", type=float, default=0.0)
    p.add_argument("--guider_max_scale", type=float, default=1.5)
    p.add_argument("--guider_min_scale", type=float, default=1.0)
    p.add_argument("--guidance_interval", type=str, default="",
                   help="lo,hi sigma band: CFG only inside it (opt-in speed mode)")
    p.add_argument("--motion_bucket", type=int, default=127)
    p.add_argument("--force_custom_mbid", action="store_true")
    p.add_argument("--cond_aug", type=float, default=0.02)
    p.add_argument("--decoding_t", type=int, default=14)
    p.add_argument("--autocast", type=int, default=1)
    p.add_argument("--support_ema", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_frames", action="store_true")
    p.add_argument("--shard", type=str, default="0/1",
                   help="i/n example sharding across separate launches")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="shard each clip's sampling over a data mesh axis "
                        "(multi-chip serving; mesh_data*mesh_fsdp chips)")
    p.add_argument("--mesh_fsdp", type=int, default=1)
    p.add_argument("--mesh_tensor", type=int, default=1,
                   help="Megatron tensor-parallel axis for serving (parallel/mesh.py)")
    p.add_argument("--cpu_devices", type=int, default=0,
                   help="force N virtual CPU devices (for mesh testing "
                        "without TPU chips; goes through jax.config)")
    return p


def process_example(bundle, args, input_fp: str, out_dp: str, key):
    import jax
    import jax.numpy as jnp

    input_rgb = eval_utils.load_image_or_video(
        input_fp, args.num_frames, args.frame_offset, args.frame_stride,
        center_crop=True, frame_width=args.frame_width,
        frame_height=args.frame_height)

    batch_np = eval_utils.construct_batch(
        input_rgb, args.azimuth, args.elevation, args.radius,
        args.input_frames, args.frame_rate, args.motion_bucket,
        args.cond_aug, args.force_custom_mbid, bundle,
        rng=np.random.default_rng(args.seed))
    batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
             for k, v in batch_np.items()}

    sampler = eval_utils.make_sampler(bundle, args.mesh_data, args.mesh_fsdp,
                                      decoding_t=args.decoding_t,
                                      mesh_tensor=args.mesh_tensor)
    samples = []
    for s in range(args.num_samples):
        t0 = time.time()
        out = sampler(batch, jax.random.fold_in(key, s))
        sampled = np.asarray(out["sampled_video"])
        samples.append(sampled)
        print(f"  sample {s}: {time.time() - t0:.1f}s")

    base = os.path.splitext(os.path.basename(input_fp))[0]
    cond_vid = np.asarray(out["cond_video"])
    for s, sampled in enumerate(samples):
        eval_utils.write_video_and_frames(
            out_dp, f"{base}_out{s}", sampled, fps=args.frame_rate,
            save_frames=args.save_frames)
    eval_utils.write_video_and_frames(out_dp, f"{base}_in", cond_vid,
                                      fps=args.frame_rate)
    side = np.concatenate([cond_vid, samples[0]], axis=2)
    eval_utils.write_video_and_frames(out_dp, f"{base}_ioside", side,
                                      fps=args.frame_rate)

    metrics = {
        "input": input_fp,
        "azimuth": args.azimuth,
        "elevation": args.elevation,
        "radius": args.radius,
        "diversity_std": sample_diversity(samples),
    }
    with open(os.path.join(out_dp, f"{base}_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def main(argv=None):
    import jax

    args = get_parser().parse_args(argv)
    if args.cpu_devices > 0:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    key = jax.random.PRNGKey(args.seed)

    bundle = eval_utils.load_model_bundle(
        args.config_path, args.model_path, support_ema=bool(args.support_ema),
        num_steps=args.num_steps, num_frames=args.num_frames,
        max_scale=args.guider_max_scale, min_scale=args.guider_min_scale,
            guidance_interval=(tuple(map(float, args.guidance_interval.split(",")))
                               if args.guidance_interval else None),
        img_hw=(args.frame_height, args.frame_width), verbose=True)

    inputs = eval_utils.resolve_input_paths(args.input)
    shard_i, shard_n = map(int, args.shard.split("/"))
    inputs = inputs[shard_i::shard_n]
    print(f"Processing {len(inputs)} inputs (shard {args.shard})...")

    os.makedirs(args.output, exist_ok=True)
    all_metrics = []
    for i, fp in enumerate(inputs):
        print(f"[{i + 1}/{len(inputs)}] {fp}")
        m = process_example(bundle, args, fp, args.output,
                            jax.random.fold_in(key, i))
        all_metrics.append(m)

    summary = {"num_examples": len(all_metrics),
               "mean_diversity": float(np.mean(
                   [m["diversity_std"] for m in all_metrics]))
               if all_metrics else 0.0}
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump({"summary": summary, "examples": all_metrics}, f, indent=2)
    print(f"Done. {summary}")


if __name__ == "__main__":
    main()
