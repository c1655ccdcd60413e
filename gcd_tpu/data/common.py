"""Frame I/O + preprocessing + trajectory construction.

Behavioral reference: gcd-model/sgm/data/common.py. NHWC numpy throughout
(the reference is CHW torch); images live in [-1, 1] float32.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional, Tuple

import cv2
import numpy as np

logger = logging.getLogger("gcd_tpu.data")


def log_retry(dataset: str, idx, retry_idx: int, max_retries: int,
              exc: BaseException) -> None:
    """Rate-limited warning for dataset retry loops.

    The reference prints every dataset failure (kubric_arbit.py:124-222);
    silent retries make a misconfigured `pcl_root` look like a hang. Logs the
    first few retries per worker verbatim, then every 10th.
    """
    if retry_idx < 3 or (retry_idx + 1) % 10 == 0:
        logger.warning(
            "%s: __getitem__(idx=%s) failed (retry %d/%d): %s: %s",
            dataset, idx, retry_idx + 1, max_retries,
            type(exc).__name__, exc)


# ---------------------------------------------------------------------------
# JSON helpers (common.py:427-447)
# ---------------------------------------------------------------------------


class JsonNumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


def load_json(fp: str):
    with open(fp, "r") as f:
        return json.load(f)


def save_json(obj, fp: str):
    with open(fp, "w") as f:
        json.dump(obj, f, cls=JsonNumpyEncoder, indent=2)


# ---------------------------------------------------------------------------
# Image preprocessing (common.py:56-165)
# ---------------------------------------------------------------------------


def center_crop_to_ar(img: np.ndarray, target_ar: float) -> np.ndarray:
    """Center-crop (H, W, C) to the target aspect ratio (common.py:56-86)."""
    h, w = img.shape[:2]
    cur_ar = w / h
    if cur_ar > target_ar + 1e-6:
        new_w = int(round(h * target_ar))
        x0 = (w - new_w) // 2
        return img[:, x0:x0 + new_w]
    if cur_ar < target_ar - 1e-6:
        new_h = int(round(w / target_ar))
        y0 = (h - new_h) // 2
        return img[y0:y0 + new_h]
    return img


def process_image(
    img: np.ndarray,
    center_crop: bool,
    frame_width: int,
    frame_height: int,
) -> np.ndarray:
    """uint8/float (H, W, 3) -> float32 (H', W', 3) in [-1, 1]
    (common.py:133-165; NHWC instead of CHW)."""
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    if center_crop:
        img = center_crop_to_ar(img, frame_width / frame_height)
    if img.shape[0] != frame_height or img.shape[1] != frame_width:
        img = cv2.resize(img, (frame_width, frame_height),
                         interpolation=cv2.INTER_LINEAR)
    return img * 2.0 - 1.0


def load_image(fp: str) -> np.ndarray:
    """RGB uint8 (H, W, 3)."""
    img = cv2.imread(fp, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(fp)
    if img.ndim == 3 and img.shape[-1] >= 3:
        img[..., :3] = img[..., :3][..., ::-1]  # BGR -> RGB
    return img


def load_video_mp4(fp: str, max_frames: Optional[int] = None) -> np.ndarray:
    """(T, H, W, 3) uint8 via OpenCV (replaces the reference's mediapy,
    common.py:166-200)."""
    cap = cv2.VideoCapture(fp)
    if not cap.isOpened():
        raise FileNotFoundError(fp)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[..., ::-1])
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {fp}")
    return np.stack(frames)


def save_video_mp4(fp: str, frames: np.ndarray, fps: int = 12,
                   quality: int = 8) -> None:
    """(T, H, W, 3) uint8/float in [0,1] -> mp4, with the reference's retry
    behavior (eval_utils.py:553-566). Prefers imageio-ffmpeg; falls back to
    OpenCV's VideoWriter (this image ships imageio without the ffmpeg plugin)."""
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0.0, 1.0) * 255.0).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(fp)), exist_ok=True)
    last_err = None
    for attempt in range(3):
        try:
            import imageio

            imageio.mimwrite(fp, list(frames), fps=fps, quality=quality)
            return
        except Exception as e:
            last_err = e
    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        raise last_err or RuntimeError(f"cannot open video writer for {fp}")
    for frame in frames:
        writer.write(frame[..., ::-1])
    writer.release()


def load_kubric_video_rgb_frames(
    scene_dp: str,
    view_idx: int,
    clip_frames,
    center_crop: bool,
    frame_width: int,
    frame_height: int,
    phase: int = 0,
) -> np.ndarray:
    """Load per-frame Kubric RGBA pngs for one view (common.py:202-270).
    Layout: {scene}/frames_p{phase}_v{view}/rgba_{t:05d}.png."""
    scene_dn = os.path.basename(scene_dp.rstrip("/"))
    frames = []
    frames_dp = os.path.join(scene_dp, f"frames_p{phase}_v{view_idx}")
    for t in clip_frames:
        fp = os.path.join(frames_dp, f"rgba_{t:05d}.png")
        img = load_image(fp)
        frames.append(process_image(img, center_crop, frame_width, frame_height))
    return np.stack(frames)


# ---------------------------------------------------------------------------
# Trajectory construction (common.py:450-479)
# ---------------------------------------------------------------------------


def construct_trajectory(
    spherical_start: np.ndarray,
    spherical_end: np.ndarray,
    trajectory: str,
    model_frames: int,
    move_time: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """src stays at the start pose; dst interpolates start -> end over
    `move_time` frames (linear or sine ease), then holds the end pose."""
    tcm = model_frames
    spherical_src = np.tile(spherical_start[None], (tcm, 1)).astype(np.float32)
    spherical_dst = np.tile(spherical_end[None], (tcm, 1)).astype(np.float32)
    if move_time >= 1:
        for t in range(0, move_time):
            if trajectory == "interpol_linear":
                alpha = t / move_time
            elif trajectory == "interpol_sine":
                alpha = (1.0 - np.cos(t / move_time * np.pi)) / 2.0
            else:
                raise ValueError(f"Unknown trajectory: {trajectory}")
            if t < tcm:
                spherical_dst[t] = spherical_start * (1.0 - alpha) + spherical_end * alpha
    return spherical_src, spherical_dst


# ---------------------------------------------------------------------------
# ParallelDomain-4D frame loading / visualization (common.py:255-424)
# ---------------------------------------------------------------------------


def get_pardom_camera_dn(ego_magic: str, view_idx: int) -> str:
    if ego_magic == "ego":
        return ["yaw-60", "yaw-0", "yaw-neg-60"][view_idx]  # left to right
    if ego_magic == "magic":
        return f"camera{view_idx}"  # back view, counterclockwise
    raise ValueError(ego_magic)


def load_pardom_frame(scene_dp: str, modality: str, camera: str, time_idx: int):
    """Raw PD frame: depth (H, W) f32; rgb-like (H, W, 4) f32 in [0,1];
    segmentation (H, W) uint24 packed ids (common.py:271-303)."""
    if "depth" in modality:
        fp = os.path.join(scene_dp, modality, camera, f"{time_idx * 10 + 5:018d}.npz")
        return np.load(fp)["data"]
    fp = os.path.join(scene_dp, modality, camera, f"{time_idx * 10 + 5:018d}.png")
    img = cv2.imread(fp, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(fp)
    if img.ndim == 2:
        img = img[..., None]
    # BGR(A) -> RGB(A), float [0, 1] like plt.imread on 8-bit pngs
    if img.shape[-1] >= 3:
        img = np.concatenate([img[..., 2:3], img[..., 1:2], img[..., 0:1],
                              img[..., 3:4] if img.shape[-1] == 4 else
                              np.full_like(img[..., :1], 255)], axis=-1)
    frame = img.astype(np.float32) / 255.0
    if "segmentation" in modality:
        f = (frame * 255.0).astype(np.int64)
        frame = f[..., 0] + f[..., 1] * 256 + f[..., 2] * 256 * 256
    return frame


def visualize_pardom_frame(frame, modality: str, camera: str, ontology) -> np.ndarray:
    """Any PD modality -> (H, W, 3) float32 in [0, 1] (common.py:306-390)."""
    if "depth" in modality:
        depth_vis = np.exp(-frame / 12.0)
        dmin, dmax = depth_vis.min(), depth_vis.max()
        depth_vis = (depth_vis - dmin) / (dmax - dmin + 1e-7)
        import matplotlib.pyplot as plt

        return plt.cm.plasma(depth_vis)[..., 0:3].astype(np.float32)
    if "instance" in modality:
        return ontology["instance_id_rgb_map"][frame % 65536].astype(np.float32)
    if "motion" in modality:
        import matplotlib.colors

        dx = frame[..., 0] + frame[..., 1] * 256.0 - 128.0
        dy = frame[..., 2] + frame[..., 3] * 256.0 - 128.0
        angle = np.arctan2(dy, dx)
        mag = np.sqrt(dx**2 + dy**2)
        hue = (angle + np.pi) / (2.0 * np.pi)
        value = np.clip(np.sqrt(mag / (mag.max() + 1e-7)), 0.0, 1.0)
        hsv = np.stack([hue, np.ones_like(hue), value], axis=-1)
        return matplotlib.colors.hsv_to_rgb(hsv).astype(np.float32)
    if "rgb" in modality:
        return frame[..., 0:3].astype(np.float32)
    if "semantic" in modality:
        return np.asarray(ontology["semantic_id_rgb_map"])[frame].astype(np.float32)
    if "surface" in modality:
        return frame[..., 0:3].astype(np.float32)
    raise ValueError(modality)


def load_pardom_video_vis_frames(scene_dp, modality, ego_magic, view_inds, ontology,
                                 clip_frames, center_crop, frame_width, frame_height):
    """(T, H, W, 3) float32 in [-1, 1] (common.py:391-424; NHWC)."""
    if modality == "segm":
        modality = "semantic_segmentation_2d"
    if not isinstance(view_inds, list):
        view_inds = [view_inds] * len(clip_frames)
    frames = []
    for view_idx, frame_idx in zip(view_inds, clip_frames):
        camera = get_pardom_camera_dn(ego_magic, view_idx)
        raw = load_pardom_frame(scene_dp, modality, camera, frame_idx)
        vis = visualize_pardom_frame(raw, modality, camera, ontology)
        frames.append(process_image(vis, center_crop, frame_width, frame_height))
    return np.stack(frames)
