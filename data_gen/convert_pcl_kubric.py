"""Offline Kubric-4D RGB-D -> merged-point-cloud cache converter.

Behavioral reference: data-gen/convert_pcl_kubric.py — per scene, per frame,
per 16 views: load rgba png / depth tiff / segmentation png, apply the
ball->plane depth correction (:96-121), unproject every pixel, merge views and
store compressed ``[xyz f16, rgb u8, segm_rgb u8]`` as
``pcl_rgb_segm_{t:05d}.pt`` (:230-245).

The reference parallelizes over GPUs; here the unprojection is pure numpy and
the pool is process-parallel over CPU cores (the math is bandwidth-bound).

Usage:
    python data_gen/convert_pcl_kubric.py --input_root /data/Kubric-4D/data \
        --output_root /data/Kubric-4D/pcl --num_workers 8
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_gen import data_utils
from gcd_tpu.data.geometry import get_kubric_camera_matrices


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--input_root", type=str, required=True)
    p.add_argument("--output_root", type=str, required=True)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=3000)
    p.add_argument("--num_views", type=int, default=16)
    p.add_argument("--num_frames", type=int, default=60)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--ignore_if_exist", type=int, default=1)
    p.add_argument("--debug", type=int, default=0)
    return p


def load_frame_views(scene_dp, views, t, all_intrinsics):
    """Load (rgb, plane-depth, segm_rgb) per view for one frame."""
    import cv2
    from PIL import Image

    frame_rgb, frame_depth, frame_segm = [], [], []
    for j in views:
        frames_dp = os.path.join(scene_dp, f"frames_p0_v{j}")
        rgb = cv2.imread(os.path.join(frames_dp, f"rgba_{t:05d}.png"),
                         cv2.IMREAD_UNCHANGED)
        if rgb is None:
            raise FileNotFoundError(frames_dp)
        rgb = rgb[..., 2::-1].astype(np.float32) / 255.0  # BGR(A)->RGB
        depth_ball = np.asarray(
            Image.open(os.path.join(frames_dp, f"depth_{t:05d}.tiff")),
            dtype=np.float32)
        depth = data_utils.correct_depth_ball_plane(
            depth_ball, all_intrinsics[j])
        segm = cv2.imread(os.path.join(frames_dp, f"segmentation_{t:05d}.png"),
                          cv2.IMREAD_UNCHANGED)
        segm = segm[..., 2::-1].astype(np.float32) / 255.0
        frame_rgb.append(rgb)
        frame_depth.append(depth)
        frame_segm.append(segm)
    return frame_rgb, frame_depth, frame_segm


def process_scene(worker_idx, scene_dp, output_dp, num_views, sel_frames,
                  ignore_if_exist=True):
    import torch

    if ignore_if_exist and os.path.isdir(output_dp) and \
            len(os.listdir(output_dp)) >= len(sel_frames):
        print(f"{worker_idx}: skipping complete {output_dp}")
        return False

    scene_dn = os.path.basename(scene_dp)
    views = list(range(num_views))

    # Per-view camera matrices (intrinsics normalized -> pixels).
    all_k, all_rt = [], []
    for j in views:
        metadata = data_utils.load_json(
            os.path.join(scene_dp, f"{scene_dn}_p0_v{j}.json"))
        k_t, rt_t = get_kubric_camera_matrices(metadata)
        w, h = metadata["scene"]["resolution"]
        k_t = k_t.copy()
        k_t[:, 0, :] *= w
        k_t[:, 1, :] *= h
        all_k.append(k_t)
        all_rt.append(rt_t)

    t0 = time.time()
    os.makedirs(output_dp, exist_ok=True)
    for t in sel_frames:
        k_frame = [all_k[j][t] for j in views]
        rgbs, depths, segms = load_frame_views(scene_dp, views, t, k_frame)
        frame_xyzfeats = []
        for j in views:
            feats = np.concatenate([rgbs[j], segms[j]], axis=-1)
            xyzfeats = data_utils.unproject_pixels_to_points(
                feats, depths[j], k_frame[j], all_rt[j][t])
            frame_xyzfeats.append(xyzfeats)
        frame_xyzfeats = np.stack(frame_xyzfeats)  # (V, N, 9)

        store_xyz = torch.from_numpy(
            frame_xyzfeats[..., 0:3].astype(np.float16))
        store_rgb = torch.from_numpy(
            (frame_xyzfeats[..., 3:6] * 255.0).astype(np.uint8))
        store_segm = torch.from_numpy(
            (frame_xyzfeats[..., 6:9] * 255.0).astype(np.uint8))
        torch.save([store_xyz, store_rgb, store_segm],
                   os.path.join(output_dp, f"pcl_rgb_segm_{t:05d}.pt"))

    print(f"{worker_idx}: {scene_dn} done in {time.time() - t0:.1f}s")
    return True


def worker(worker_idx, examples, args):
    data_utils.update_os_cpu_affinity(worker_idx, args.num_workers)
    sel_frames = list(range(args.num_frames))
    for scene_dp, output_dp in examples:
        try:
            process_scene(worker_idx, scene_dp, output_dp, args.num_views,
                          sel_frames, bool(args.ignore_if_exist))
        except Exception as e:
            print(f"{worker_idx}: failed {scene_dp}: {e}")


def main(argv=None):
    args = get_parser().parse_args(argv)
    examples = []
    for i in range(args.start_idx, args.end_idx):
        scene_dp = os.path.join(args.input_root, f"scn{i:05d}")
        if os.path.isdir(scene_dp):
            examples.append(
                (scene_dp, os.path.join(args.output_root, f"scn{i:05d}")))
    print(f"{len(examples)} scenes to process")

    if args.num_workers <= 1 or args.debug:
        worker(0, examples, args)
    else:
        shards = [examples[i::args.num_workers] for i in range(args.num_workers)]
        procs = [mp.Process(target=worker, args=(i, shard, args))
                 for i, shard in enumerate(shards)]
        for p in procs:
            p.start()
        for p in procs:
            p.join()


if __name__ == "__main__":
    main()
