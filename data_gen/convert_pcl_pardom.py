"""Offline ParallelDomain-4D RGB-D -> merged-point-cloud cache converter.

Behavioral reference: data-gen/convert_pcl_pardom.py — per scene, per frame,
19 views (16 magic + 3 ego): load rgb png / depth npz / semantic png, clamp
depth to MAX_DEPTH (f16 would overflow on the skybox, :51), unproject, and
store ``[xyz f16, rgb u8, segm-id u8, view-tag u8]`` as
``pcl_rgb_segm_{t*10+5:06d}.pt`` (:215-228).

Usage:
    python data_gen/convert_pcl_pardom.py --input_root /data/ParallelDomain-4D/data \
        --output_root /data/ParallelDomain-4D/pcl --num_workers 8
"""

from __future__ import annotations

import argparse
import glob
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_gen import data_utils
from gcd_tpu.data.geometry import get_pardom_camera_matrices

MAX_DEPTH = 30000.0  # f16-safe clamp (convert_pcl_pardom.py:51)


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--input_root", type=str, required=True)
    p.add_argument("--output_root", type=str, required=True)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=1600)
    p.add_argument("--num_frames", type=int, default=50)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--ignore_if_exist", type=int, default=1)
    return p


def process_scene(worker_idx, scene_dp, output_dp, sel_frames,
                  ignore_if_exist=True):
    import cv2
    import torch

    if ignore_if_exist and os.path.isdir(output_dp) and \
            len(os.listdir(output_dp)) >= len(sel_frames):
        print(f"{worker_idx}: skipping complete {output_dp}")
        return False

    calibration = data_utils.load_json(
        glob.glob(os.path.join(scene_dp, "calibration", "*.json"))[0])
    view_names, all_k, all_rt = get_pardom_camera_matrices(calibration)

    t0 = time.time()
    os.makedirs(output_dp, exist_ok=True)
    for t in sel_frames:
        frame_xyzfeats = []
        skip_frame = False
        for j, view in enumerate(view_names):
            rgb_fp = os.path.join(scene_dp, "rgb", view,
                                  f"{t * 10 + 5:018d}.png")
            depth_fp = os.path.join(scene_dp, "depth", view,
                                    f"{t * 10 + 5:018d}.npz")
            segm_fp = os.path.join(scene_dp, "semantic_segmentation_2d", view,
                                   f"{t * 10 + 5:018d}.png")
            if not (os.path.isfile(rgb_fp) and os.path.isfile(depth_fp)
                    and os.path.isfile(segm_fp)):
                print(f"{worker_idx}: missing files for frame {t} view {view}")
                skip_frame = True
                break
            rgb = cv2.imread(rgb_fp, cv2.IMREAD_UNCHANGED)
            rgb = rgb[..., 2::-1].astype(np.float32) / 255.0
            depth = np.clip(np.load(depth_fp)["data"].astype(np.float32),
                            0.0, MAX_DEPTH)
            segm_img = cv2.imread(segm_fp, cv2.IMREAD_UNCHANGED)
            segm = segm_img[..., 2].astype(np.float32)  # R channel = class id

            tag = np.full_like(segm, j)
            feats = np.concatenate(
                [rgb, segm[..., None], tag[..., None]], axis=-1)
            xyzfeats = data_utils.unproject_pixels_to_points(
                feats, depth, all_k[j], all_rt[j])
            frame_xyzfeats.append(xyzfeats)
        if skip_frame:
            continue
        frame_xyzfeats = np.stack(frame_xyzfeats)  # (V, N, 8)

        store_xyz = torch.from_numpy(
            frame_xyzfeats[..., 0:3].astype(np.float16))
        store_rgb = torch.from_numpy(
            (frame_xyzfeats[..., 3:6] * 255.0).astype(np.uint8))
        store_segm = torch.from_numpy(
            frame_xyzfeats[..., 6:7].astype(np.uint8))
        store_tag = torch.from_numpy(
            frame_xyzfeats[..., 7:8].astype(np.uint8))
        torch.save([store_xyz, store_rgb, store_segm, store_tag],
                   os.path.join(output_dp, f"pcl_rgb_segm_{t * 10 + 5:06d}.pt"))

    print(f"{worker_idx}: {os.path.basename(scene_dp)} done in "
          f"{time.time() - t0:.1f}s")
    return True


def worker(worker_idx, examples, args):
    data_utils.update_os_cpu_affinity(worker_idx, args.num_workers)
    sel_frames = list(range(args.num_frames))
    for scene_dp, output_dp in examples:
        try:
            process_scene(worker_idx, scene_dp, output_dp, sel_frames,
                          bool(args.ignore_if_exist))
        except Exception as e:
            print(f"{worker_idx}: failed {scene_dp}: {e}")


def main(argv=None):
    args = get_parser().parse_args(argv)
    scene_dns = sorted(
        dn for dn in os.listdir(args.input_root)
        if "scene" in dn and os.path.isdir(os.path.join(args.input_root, dn)))
    scene_dns = scene_dns[args.start_idx:args.end_idx]
    examples = [
        (os.path.join(args.input_root, dn), os.path.join(args.output_root, dn))
        for dn in scene_dns
    ]
    print(f"{len(examples)} scenes to process")
    if args.num_workers <= 1:
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
