"""Dataset-preprocessing utilities (reference: data-gen/data_utils.py).

numpy host-side implementations: pinhole unprojection, camera transforms,
depth/segmentation visualization, video writing.
"""

from __future__ import annotations

import json
import os

import numpy as np


def load_json(fp):
    with open(fp, "r") as f:
        return json.load(f)


def save_json(obj, fp):
    with open(fp, "w") as f:
        json.dump(obj, f, indent=2)


def camera_to_world(xyz_camera, extrinsics):
    return xyz_camera @ extrinsics[0:3, 0:3].T + extrinsics[0:3, 3]


def world_to_camera(xyz_world, extrinsics):
    return (xyz_world - extrinsics[0:3, 3]) @ extrinsics[0:3, 0:3]


def unproject_pixels_to_points(feats: np.ndarray, depth: np.ndarray,
                               K: np.ndarray, RT: np.ndarray,
                               dtype=np.float64) -> np.ndarray:
    """(H, W, C) features + (H, W) plane depth -> (H*W, 3+C) world points
    (data_utils.py:103-138). Features may be any channel count."""
    h, w, c = feats.shape
    u, v = np.meshgrid(np.arange(w, dtype=dtype), np.arange(h, dtype=dtype),
                       indexing="xy")
    z = depth.reshape(-1).astype(dtype)
    u = u.reshape(-1)
    v = v.reshape(-1)
    x = (u - K[0, 2]) * z / K[0, 0]
    y = (v - K[1, 2]) * z / K[1, 1]
    xyz_camera = np.stack((x, y, z), axis=1)
    xyz_world = camera_to_world(xyz_camera, RT.astype(dtype))
    return np.concatenate(
        [xyz_world, feats.reshape(-1, c).astype(dtype)], axis=1)


def correct_depth_ball_plane(depth_ball: np.ndarray,
                             intrinsics: np.ndarray) -> np.ndarray:
    """Blender exports ball (euclidean) depth; convert to plane (z) depth
    (convert_pcl_kubric.py:96-121)."""
    h, w = depth_ball.shape[-2:]
    fov_x = 2.0 * np.arctan(w / (2.0 * abs(intrinsics[0, 0])))
    fov_y = 2.0 * np.arctan(h / (2.0 * abs(intrinsics[1, 1])))
    angles_x = np.linspace(-fov_x / 2.0, fov_x / 2.0, w)
    angles_y = np.linspace(-fov_y / 2.0, fov_y / 2.0, h)
    mx = np.tan(angles_x)
    my = np.tan(angles_y)
    correction = np.sqrt(mx[None, :] ** 2 + my[:, None] ** 2 + 1.0)
    return depth_ball / correction


def depth_to_vis(depth: np.ndarray) -> np.ndarray:
    vis = np.exp(-depth / 12.0)
    vis = (vis - vis.min()) / (vis.max() - vis.min() + 1e-7)
    import matplotlib.pyplot as plt

    return plt.cm.plasma(vis)[..., :3].astype(np.float32)


def segm_ids_to_vis(segm: np.ndarray, seed: int = 4) -> np.ndarray:
    rng = np.random.default_rng(seed)
    palette = rng.uniform(0.1, 1.0, (int(segm.max()) + 1, 3))
    return palette[segm].astype(np.float32)


def save_video(fp, frames, fps=12):
    from gcd_tpu.data.common import save_video_mp4

    save_video_mp4(fp, np.asarray(frames), fps=fps)


def update_os_cpu_affinity(rank, num_workers):
    try:
        import psutil

        cores = list(range(psutil.cpu_count()))
        chunk = max(1, len(cores) // max(num_workers, 1))
        mine = cores[rank * chunk:(rank + 1) * chunk] or cores
        psutil.Process().cpu_affinity(mine)
    except Exception:
        pass
