"""Training-time visual logging.

Behavioral reference: gcd-model/main.py ImageLogger (:323-555) + my_save_video
(:576): every `batch_frequency` steps, run a full sampling pass on (a slice of)
the current batch, write mp4 videos and png frame strips with metadata-rich
filenames (scene / fps / motion / angles), plus VAE round-trips of target and
conditioning frames.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from gcd_tpu.data.common import save_video_mp4


def _to_uint8(video01: np.ndarray) -> np.ndarray:
    return (np.clip(video01, 0.0, 1.0) * 255.0).astype(np.uint8)


def _frame_strip(video01: np.ndarray, max_frames: int = 8) -> np.ndarray:
    t = video01.shape[0]
    sel = np.linspace(0, t - 1, min(t, max_frames)).astype(int)
    return np.concatenate([video01[i] for i in sel], axis=1)


class ImageLogger:
    def __init__(self, logdir: str, batch_frequency: int = 100,
                 max_images: int = 8, disabled: bool = False,
                 log_first_step: bool = True, fps: int = 8, **kwargs):
        self.media_dir = os.path.join(logdir, "images", "train")
        self.batch_frequency = int(batch_frequency)
        self.max_images = int(max_images)
        self.disabled = disabled
        self.log_first_step = log_first_step
        self.fps = fps
        os.makedirs(self.media_dir, exist_ok=True)

    def should_log(self, global_step: int) -> bool:
        if self.disabled:
            return False
        if global_step == 0:
            return self.log_first_step
        return global_step % self.batch_frequency == 0

    def _meta_name(self, global_step: int, batch: Dict) -> str:
        parts = [f"gs-{global_step:07d}"]
        for key, tag in (("scene_idx", "scn"), ("fps_id", "fps"),
                         ("motion_bucket_id", "mbid")):
            if key in batch:
                v = np.asarray(batch[key]).reshape(-1)
                parts.append(f"{tag}-{int(v[0])}")
        if "scaled_relative_angles" in batch:
            ang = np.asarray(batch["scaled_relative_angles"]).reshape(-1, 3)[-1]
            parts.append(
                "az-%.2f_el-%.2f_r-%.2f" % (float(ang[0]), float(ang[1]),
                                            float(ang[2])))
        return "_".join(parts)

    def log(self, engine, params, batch: Dict, global_step: int, key) -> None:
        """Sample one video from the batch and write artifacts."""
        import jax
        import jax.numpy as jnp
        import cv2

        t = int(np.asarray(batch["image_only_indicator"]).shape[-1])
        # Limit to the first video in the batch (limit_batch=1 semantics,
        # diffusion.py:510-520).
        small = {}
        bt_full = np.asarray(batch["jpg"]).shape[0]
        for k, v in batch.items():
            arr = np.asarray(v) if not np.isscalar(v) else v
            if np.isscalar(v):
                small[k] = v
            elif arr.ndim >= 1 and arr.shape[0] == bt_full:
                small[k] = jnp.asarray(arr[:t])
            elif k == "image_only_indicator":
                small[k] = jnp.asarray(arr[:1])
            else:
                small[k] = jnp.asarray(arr[:1]) if arr.ndim >= 1 else arr

        out = engine.sample_video(params, small, key, decoding_t=min(t, 7))
        name = self._meta_name(global_step, small)

        sampled = np.asarray(out["sampled_video"])
        cond = np.asarray(out["cond_video"])
        rows = [cond, sampled]
        if "gt_video" in out:
            rows.append(np.asarray(out["gt_video"]))
        stack = np.concatenate(rows, axis=1)  # vertical concat per frame

        save_video_mp4(
            os.path.join(self.media_dir, f"{name}_sample.mp4"), stack,
            fps=self.fps)
        strip = _to_uint8(_frame_strip(stack))
        cv2.imwrite(
            os.path.join(self.media_dir, f"{name}_strip.png"),
            strip[..., ::-1])
