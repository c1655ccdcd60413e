"""Generate tiny synthetic Kubric-4D / ParallelDomain-4D dataset roots.

Purpose: drive `main.py` (and the data pipeline generally) end-to-end on any
machine without the real 7.0/4.4 TB datasets — the on-disk layout mirrors what
the reference's converters emit (convert_pcl_kubric.py:230-245 /
convert_pcl_pardom.py:215-228) at toy sizes, matching the fixtures used by
tests/test_data_{kubric,pardom}.py and the paths that
configs/smoke_{kubric,pardom}_tiny.yaml point at (/tmp/kubric_fake, /tmp/pd_fake).

Usage:
    python scripts/make_fake_data.py [--kubric_root /tmp/kubric_fake]
                                     [--pardom_root /tmp/pd_fake]
                                     [--scenes 1] [--frames 20] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcd_tpu.data import common  # noqa: E402


def make_kubric_root(root: str, n_scenes: int = 1, n_frames: int = 20,
                     n_views: int = 4, n_points: int = 3000, seed: int = 0):
    import torch

    rng = np.random.default_rng(seed)
    for s in range(n_scenes):
        scn = f"scn{s:05d}"
        scene_data = os.path.join(root, "data", scn)
        scene_pcl = os.path.join(root, "pcl", scn)
        os.makedirs(scene_data, exist_ok=True)
        os.makedirs(scene_pcl, exist_ok=True)
        metadata = {
            "scene": {"num_frames": n_frames},
            "camera": {
                "quaternions": [[1.0, 0.0, 0.0, 0.0]] * n_frames,
                "positions": [[0.0, -14.0, 2.0]] * n_frames,
                "K": [[0.875, 0.0, 0.5], [0.0, 1.3125, 0.5], [0.0, 0.0, 1.0]],
            },
        }
        common.save_json(metadata, os.path.join(scene_data, f"{scn}_p0_v4.json"))
        for t in range(n_frames):
            theta = t * 0.1
            base = rng.normal(size=(n_views, n_points, 3)) * 1.5
            base[..., 2] += 1.0
            rot = np.array([
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1.0],
            ])
            xyz = (base @ rot.T).astype(np.float16)
            rgb = rng.integers(0, 255, (n_views, n_points, 3), dtype=np.uint8)
            segm = rng.integers(0, 10, (n_views, n_points, 3), dtype=np.uint8)
            torch.save(
                [torch.from_numpy(xyz), torch.from_numpy(rgb),
                 torch.from_numpy(segm)],
                os.path.join(scene_pcl, f"pcl_rgb_segm_{t:05d}.pt"),
            )
    print(f"kubric fake root: {root} ({n_scenes} scenes x {n_frames} frames)")


def make_pardom_root(root: str, n_scenes: int = 1, n_frames: int = 50,
                     n_points: int = 1500, seed: int = 0):
    import cv2
    import torch

    n_views = 19  # 16 magic + 3 ego
    rng = np.random.default_rng(seed)

    def quat(w, x, y, z):
        return {"qw": w, "qx": x, "qy": y, "qz": z}

    scene_names = []
    for s in range(n_scenes):
        scn = f"scene_{s:06d}"
        scene_names.append(scn)
        scene = os.path.join(root, "data", scn)
        pcl_scene = os.path.join(root, "pcl", scn)
        os.makedirs(os.path.join(scene, "calibration"), exist_ok=True)
        os.makedirs(os.path.join(scene, "ontology"), exist_ok=True)
        os.makedirs(pcl_scene, exist_ok=True)

        names, intr, extr = [], [], []
        for i in range(16):
            names.append(f"camera{i}")
            intr.append({"fx": 400.0, "fy": 400.0, "cx": 320.0, "cy": 240.0})
            extr.append({"rotation": quat(1.0, 0, 0, 0),
                         "translation": {"x": -42.0, "y": 0.0, "z": 6.0}})
        for nm in ("yaw-0", "yaw-60", "yaw-neg-60"):
            names.append(nm)
            intr.append({"fx": 500.0, "fy": 500.0, "cx": 320.0, "cy": 240.0})
            extr.append({"rotation": quat(1.0, 0, 0, 0),
                         "translation": {"x": 1.6, "y": 0.0, "z": 1.55}})
        common.save_json(
            {"names": names, "intrinsics": intr, "extrinsics": extr},
            os.path.join(scene, "calibration", "calib.json"))

        items = [{"id": i, "color": {"r": (i * 37) % 256, "g": (i * 91) % 256,
                                     "b": (i * 53) % 256}} for i in range(30)]
        common.save_json({"items": items},
                         os.path.join(scene, "ontology", "onto.json"))

        rgb_dir = os.path.join(scene, "rgb", "yaw-0")
        os.makedirs(rgb_dir, exist_ok=True)
        for t in range(n_frames):
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(rgb_dir, f"{t * 10 + 5:018d}.png"),
                        img[..., ::-1])
            xyz = rng.normal(size=(n_views, n_points, 3)).astype(np.float16) * 6
            xyz[..., 2] = np.abs(xyz[..., 2])
            rgb = rng.integers(0, 255, (n_views, n_points, 3), dtype=np.uint8)
            segm = rng.integers(0, 30, (n_views, n_points, 1), dtype=np.uint8)
            tag = np.zeros((n_views, n_points, 1), dtype=np.uint8)
            torch.save([torch.from_numpy(xyz), torch.from_numpy(rgb),
                        torch.from_numpy(segm), torch.from_numpy(tag)],
                       os.path.join(pcl_scene,
                                    f"pcl_rgb_segm_{t * 10 + 5:06d}.pt"))
    common.save_json(
        {"train": scene_names, "val": scene_names, "test": scene_names},
        os.path.join(root, "data", "pardom_datasplit.json"))
    print(f"pardom fake root: {root} ({n_scenes} scenes x {n_frames} frames)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kubric_root", default="/tmp/kubric_fake")
    ap.add_argument("--pardom_root", default="/tmp/pd_fake")
    ap.add_argument("--scenes", type=int, default=1)
    ap.add_argument("--frames", type=int, default=0,
                    help="frames per scene (0 = per-dataset defaults 20/50)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--only", choices=["kubric", "pardom"], default=None)
    args = ap.parse_args()

    if args.only in (None, "kubric"):
        make_kubric_root(args.kubric_root, args.scenes,
                         args.frames or 20, seed=args.seed)
    if args.only in (None, "pardom"):
        make_pardom_root(args.pardom_root, args.scenes,
                         args.frames or 50, seed=args.seed)


if __name__ == "__main__":
    main()
