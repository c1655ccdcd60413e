"""Input-pipeline throughput at production scale (VERDICT r2 "Next round" #4).

The reference dedicates one A100 exclusively to point-splat rendering inside
DataLoader workers (gcd-model/sgm/data/kubric_arbit.py:426-428); the rebuild
renders on host CPUs. This benchmark measures, at the real Kubric-4D scale
(16 views, ~2M merged points per frame, 420x280 render -> 384x256 resize):

  1. raw renders/sec of one merged cloud — native C++/OpenMP splat AND the
     jittable XLA fallback (both per core: splatting is embarrassingly
     parallel across DataLoader workers/frames);
  2. end-to-end clips/sec through KubricSynthViewDataset.__getitem__ (disk
     load of the .pt caches + trajectory sampling + 2 x 14 renders + resize +
     batch-dict build);
  3. the margin against the measured training step (PERF_TRAIN.json when
     present, else the README's 380 ms => 2.63 clips/s needed), expressed as
     host cores required — this bench host has a single core; real TPU-v5e
     hosts expose tens of vCPUs per chip.

Writes PERF_INPUT.json at the repo root.

Usage:
    timeout 3600 python scripts/bench_input_pipeline.py \
        [--points_per_view 135000] [--views 16] [--frames 16] [--clips 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench_raw_renders(xyz, rgb, intr, extr, hw, iters=8):
    """Per-variant renders/s of one merged production-size cloud."""
    from gcd_tpu import native
    from gcd_tpu.data import geometry

    h, w = hw
    out = {}

    if native.native_available():
        t0 = time.time()
        for _ in range(iters):
            img = native.splat_points_native(xyz, rgb, intr, extr, h, w,
                                             spread_radius=1, mode="kubric")
            native.blur_into_black_native(img, kernel_size=21)
        out["native"] = iters / (time.time() - t0)

    # XLA fallback (jitted; same padded-bucket shapes render_point_cloud uses).
    import jax
    import jax.numpy as jnp

    pad = 1 << 18
    n = xyz.shape[0]
    n_pad = ((n + pad - 1) // pad) * pad
    xyz_p = np.zeros((n_pad, 3), np.float32)
    rgb_p = np.zeros((n_pad, 3), np.float32)
    xyz_p[:n], rgb_p[:n] = xyz, rgb
    valid = np.zeros((n_pad,), bool)
    valid[:n] = True
    args = (jnp.asarray(xyz_p), jnp.asarray(rgb_p), jnp.asarray(valid),
            jnp.asarray(intr), jnp.asarray(extr))

    def render():
        img, _ = geometry.splat_points_to_image(*args, h, w, spread_radius=1,
                                                mode="kubric")
        return np.asarray(geometry.blur_into_black(img, kernel_size=21,
                                                   sigma=21 / 4.0))

    render()  # compile
    t0 = time.time()
    for _ in range(max(2, iters // 2)):
        render()
    out["xla_cpu"] = max(2, iters // 2) / (time.time() - t0)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points_per_view", type=int, default=135000,
                    help="16 views x 135k = 2.16M merged points/frame "
                         "(576x384 source views, converter-subsampled)")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--clips", type=int, default=3)
    ap.add_argument("--root", default="/tmp/kubric_prod_bench")
    ap.add_argument("--out", default=os.path.join(ROOT, "PERF_INPUT.json"))
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from scripts.make_fake_data import make_kubric_root

    t0 = time.time()
    if not os.path.exists(os.path.join(args.root, "done.json")):
        make_kubric_root(args.root, n_scenes=1, n_frames=args.frames,
                         n_views=args.views, n_points=args.points_per_view)
        with open(os.path.join(args.root, "done.json"), "w") as f:
            json.dump(vars(args), f)
    print(f"[input-bench] fake root ready in {time.time()-t0:.1f}s "
          f"({args.views}x{args.points_per_view} pts x {args.frames} frames)",
          file=sys.stderr)

    # ---- phase 1: raw render throughput ----
    import torch

    pcl_file = os.path.join(args.root, "pcl", "scn00000", "pcl_rgb_segm_00000.pt")
    xyz_v, rgb_v, _ = torch.load(pcl_file, weights_only=False)
    xyz = np.asarray(xyz_v, np.float32).reshape(-1, 3)
    rgb = np.asarray(rgb_v, np.float32).reshape(-1, 3) / 255.0
    intr = np.array([[0.875 * 420, 0, 0.5 * 420],
                     [0, 1.3125 * 280, 0.5 * 280],
                     [0, 0, 1]], np.float32)
    from gcd_tpu.data import geometry

    extr = geometry.extrinsics_from_look_at(
        np.array([0.0, -14.0, 4.0]), np.array([0.0, 0.0, 1.0])).astype(np.float32)

    n_points = xyz.shape[0]
    renders = bench_raw_renders(xyz, rgb, intr, extr, (280, 420))
    for k, v in renders.items():
        print(f"[input-bench] raw splat {k}: {v:.1f} renders/s/core "
              f"({n_points/1e6:.2f}M points, 420x280 + hole fill)",
              file=sys.stderr)

    # ---- phase 2: end-to-end clips/s through the dataset ----
    from gcd_tpu.data.kubric import KubricSynthViewDataset
    from gcd_tpu.data.loader import PrefetchLoader, collate_fn

    dset = KubricSynthViewDataset(
        dset_root=os.path.join(args.root, "data"),
        pcl_root=os.path.join(args.root, "pcl"),
        start_idx=0, end_idx=1, avail_frames=args.frames,
        model_frames=14, input_frames=14, output_frames=14,
        mock_dset_size=64, seed=1,
    )
    dset.avail_views = args.views
    _ = dset[0]  # warm: jit compiles / native build outside the timing
    t0 = time.time()
    for i in range(args.clips):
        ex = dset[1 + i]
        collate_fn([ex])
    clip_dt = (time.time() - t0) / args.clips
    clips_per_sec = 1.0 / clip_dt
    print(f"[input-bench] end-to-end: {clip_dt:.2f} s/clip "
          f"({clips_per_sec:.3f} clips/s/core; 28 renders + I/O + collate)",
          file=sys.stderr)

    # ---- phase 3: margin vs the training step ----
    train_ms = None
    perf_train = os.path.join(ROOT, "PERF_TRAIN.json")
    if os.path.exists(perf_train):
        with open(perf_train) as f:
            train_ms = float(json.load(f)["value"])
    step_ms = train_ms or 380.0
    # bs=4 videos/GPU data-space in the reference recipe; per-chip here is
    # 1 clip/step (bt=14). Pipeline must sustain 1 clip per step wall-time.
    needed = 1e3 / step_ms
    cores_needed = needed / clips_per_sec

    result = {
        "metric": "host input-pipeline throughput, production-scale Kubric-4D",
        "points_per_frame": int(n_points),
        "views": args.views,
        "render_res": "420x280 -> 384x256",
        "renders_per_sec_per_core": {k: round(v, 2) for k, v in renders.items()},
        "clips_per_sec_per_core": round(clips_per_sec, 3),
        "sec_per_clip_per_core": round(clip_dt, 2),
        "train_step_ms": step_ms,
        "train_step_source": "PERF_TRAIN.json" if train_ms else "README estimate",
        "clips_per_sec_needed_per_chip": round(needed, 2),
        "host_cores_needed_per_chip": round(cores_needed, 1),
        "note": ("splatting parallelizes across loader workers/frames; this "
                 "bench host exposes 1 core, production v5e hosts expose "
                 "tens of vCPUs per chip (e.g. 112 vCPU per 8-chip host => "
                 "14/chip). The jittable splat_points_to_image also runs "
                 "on-TPU as a fallback for core-starved hosts."),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
