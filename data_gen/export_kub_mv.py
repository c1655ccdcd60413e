"""Kubric-4D multi-view dataset generator CLI.

Behavioral reference: data-gen/export_kub_mv.py — 3000 scenes x 16 synchronized
static views (4 at 45 deg elevation, 12 at 5 deg, radius 15, look-at [0,0,1],
:202-225); 6-16 static + 1-6 dynamic GSO objects (:84-91); per-scene fresh
subprocess with a restart counter against /tmp + memory leaks (:98-100,
369-381); renders rgba/depth/segm/flow/normal/object_coords at 576x384, 60
frames @ 24 fps (:241-259); writes per-frame files, mp4 previews and metadata
json (:266-284).

Without Blender (`--mock`), the MockBackend produces shape-correct zero layers
so the pipeline (sampling, cameras, metadata, file layout) runs anywhere —
the same strategy the vendored Kubric uses for its own tests.

Usage:
    python data_gen/export_kub_mv.py --output_root /data/Kubric-4D/data \
        --start_idx 0 --end_idx 3000 --num_workers 4 [--mock]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_gen import data_utils
from data_gen.kubric_sim import (
    DEFAULT_FPS,
    DEFAULT_FRAMES,
    KubricBackend,
    KubricSimulatorRenderer,
    MockBackend,
    sample_camera_rig,
)

# Normalized intrinsics for the 576x384 renders (focal from Kubric's default
# 32mm-equivalent camera; stored like the reference metadata K).
DEFAULT_K_NORM = [[0.875, 0.0, 0.5], [0.0, 1.3125, 0.5], [0.0, 0.0, 1.0]]


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--output_root", type=str, required=True)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=3000)
    p.add_argument("--num_views", type=int, default=16)
    p.add_argument("--num_frames", type=int, default=DEFAULT_FRAMES)
    p.add_argument("--fps", type=int, default=DEFAULT_FPS)
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--mass_priors", type=str, default="")
    p.add_argument("--mock", action="store_true",
                   help="mock renderer (no Blender) for pipeline testing")
    p.add_argument("--subprocess_per_scene", type=int, default=1,
                   help="isolate each scene in a fresh process (leak "
                        "mitigation, export_kub_mv.py:98-100)")
    p.add_argument("--max_restarts", type=int, default=3)
    p.add_argument("--scene_idx", type=int, default=-1,
                   help="(internal) single-scene child-process mode")
    return p


def _asset_ids():
    from data_gen.kubric_constants import CURATED_GSO_ASSETS

    return CURATED_GSO_ASSETS


def do_scene(scene_idx: int, args) -> bool:
    """Generate one scene (export_kub_mv.py:104-335)."""
    scene_dn = f"scn{scene_idx:05d}"
    scene_dp = os.path.join(args.output_root, scene_dn)
    os.makedirs(scene_dp, exist_ok=True)

    backend = MockBackend() if args.mock else KubricBackend(
        scratch_dir=os.path.join("/tmp", f"kubric_{scene_idx}"))
    sim = KubricSimulatorRenderer(
        backend=backend, mass_priors_fp=args.mass_priors, seed=scene_idx)

    t0 = time.time()
    sim.prepare_next_scene(seed=scene_idx, asset_ids=_asset_ids())
    sim_out = sim.simulate_frames(args.num_frames, args.fps)
    rig = sample_camera_rig()[: args.num_views]

    k_norm = np.asarray(DEFAULT_K_NORM, dtype=np.float32)
    for v, rt in enumerate(rig):
        layers = sim.render_frames(rt, args.num_frames)
        frames_dp = os.path.join(scene_dp, f"frames_p0_v{v}")
        os.makedirs(frames_dp, exist_ok=True)
        _write_layers(frames_dp, layers)
        meta = sim.get_metadata(scene_idx, rt, k_norm, args.num_frames,
                                args.fps)
        data_utils.save_json(meta, os.path.join(scene_dp,
                                                f"{scene_dn}_p0_v{v}.json"))
        if v == 0:
            preview = layers["rgba"][..., :3]
            data_utils.save_video(
                os.path.join(scene_dp, f"{scene_dn}_preview.mp4"),
                preview, fps=args.fps)

    data_utils.save_json(
        {"scene": scene_dn, "objects": sim.scene_spec["objects"],
         "trajectories": {k: v.tolist() for k, v in
                          sim_out["trajectories"].items()}},
        os.path.join(scene_dp, f"{scene_dn}_sim.json"))
    print(f"{scene_dn} done in {time.time() - t0:.1f}s")
    return True


def _write_layers(frames_dp: str, layers) -> None:
    import cv2
    from PIL import Image

    t = layers["rgba"].shape[0]
    for i in range(t):
        cv2.imwrite(os.path.join(frames_dp, f"rgba_{i:05d}.png"),
                    layers["rgba"][i][..., [2, 1, 0, 3]])
        Image.fromarray(layers["depth"][i]).save(
            os.path.join(frames_dp, f"depth_{i:05d}.tiff"))
        seg = layers["segmentation"][i][..., 0]
        seg_rgb = np.stack([seg % 256, (seg // 256) % 256, seg // 65536],
                           axis=-1).astype(np.uint8)
        cv2.imwrite(os.path.join(frames_dp, f"segmentation_{i:05d}.png"),
                    seg_rgb[..., ::-1])


def scene_worker(worker_idx: int, scene_indices, args):
    for scene_idx in scene_indices:
        if args.subprocess_per_scene and not args.mock:
            # Fresh interpreter per scene: Blender leaks memory and /tmp
            # space; the reference restarts with a counter
            # (export_kub_mv.py:358-381).
            for restart in range(args.max_restarts):
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--output_root", args.output_root,
                       "--scene_idx", str(scene_idx),
                       "--num_views", str(args.num_views),
                       "--num_frames", str(args.num_frames),
                       "--fps", str(args.fps)]
                if args.mock:
                    cmd.append("--mock")
                ret = subprocess.run(cmd).returncode
                if ret == 0:
                    break
                print(f"{worker_idx}: scene {scene_idx} failed "
                      f"(restart {restart + 1}/{args.max_restarts})")
        else:
            try:
                do_scene(scene_idx, args)
            except Exception as e:
                print(f"{worker_idx}: scene {scene_idx} failed: {e}")


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.scene_idx >= 0:
        ok = do_scene(args.scene_idx, args)
        sys.exit(0 if ok else 1)

    indices = list(range(args.start_idx, args.end_idx))
    if args.num_workers <= 1:
        scene_worker(0, indices, args)
    else:
        shards = [indices[i::args.num_workers] for i in range(args.num_workers)]
        procs = [mp.Process(target=scene_worker, args=(i, s, args))
                 for i, s in enumerate(shards)]
        for p in procs:
            p.start()
        for p in procs:
            p.join()


if __name__ == "__main__":
    main()
