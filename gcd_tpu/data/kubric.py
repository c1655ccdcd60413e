"""Kubric-4D dataset: on-the-fly point-cloud-rendered training pairs.

Behavioral reference: gcd-model/sgm/data/kubric_arbit.py (KubricSynthViewDataset
:33, sample_trajectories :262, synth_src_dst_rgb :410, construct_dict :565,
KubricSynthViewModule :658). Differences by design:
  * outputs NHWC numpy; collate (data/loader.py) merges (B, T) -> (B*T);
  * splatting runs as a jitted XLA program on the host CPU (or any jax device)
    instead of a dedicated CUDA data GPU;
  * per-item RNG is an explicit np.random.Generator seeded by (seed, idx, retry)
    so distributed input pipelines are reproducible.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from gcd_tpu.data import common, geometry
from gcd_tpu.data.loader import PrefetchLoader, collate_fn
from gcd_tpu.utils.config import register


def load_point_cloud_file(fp: str):
    """Load the converter's `pcl_rgb_segm_XXXXX.pt` ([xyz f16, rgb u8,
    segm u8], each (V, N, 3)) into numpy."""
    import torch

    pcl_xyz, pcl_rgb, pcl_segm = torch.load(fp, map_location="cpu",
                                            weights_only=False)
    return (
        pcl_xyz.numpy(),
        pcl_rgb.numpy(),
        pcl_segm.numpy(),
    )


@register("gcd_tpu.data.kubric.KubricSynthViewDataset")
class KubricSynthViewDataset:
    def __init__(
        self, dset_root, start_idx, end_idx, force_shuffle=False,
        pcl_root="",
        avail_frames=60, model_frames=14,
        input_frames=7, output_frames=14,
        center_crop=True, frame_width=384, frame_height=256,
        input_mode="arbitrary", output_mode="arbitrary",
        input_modality="rgb", output_modality="rgb",
        azimuth_range=(0.0, 360.0),
        elevation_range=(0.0, 50.0),
        radius_range=(12.0, 18.0),
        delta_azimuth_range=(-60.0, 60.0),
        delta_elevation_range=(-30.0, 30.0),
        delta_radius_range=(-3.0, 3.0),
        elevation_sample_sin=False,
        trajectory="interpol_linear", move_time=10,
        camera_control="spherical", motion_bucket_range=(127, 127),
        cond_aug=0.02, mock_dset_size=1000,
        reverse_prob=0.2, data_gpu=0,
        spread_radius=1, render_width=420, render_height=280,
        seed=0,
        **kwargs,
    ):
        self.dset_root = dset_root
        self.pcl_root = pcl_root
        self.start_idx = int(start_idx)
        self.end_idx = int(end_idx)
        self.num_scenes = self.end_idx - self.start_idx
        self.force_shuffle = force_shuffle
        self.avail_frames = min(int(avail_frames), 60)
        self.model_frames = int(model_frames)
        self.input_frames = int(input_frames)
        self.output_frames = int(output_frames)
        self.center_crop = center_crop
        self.frame_width = int(frame_width)
        self.frame_height = int(frame_height)
        self.input_mode = input_mode
        self.output_mode = output_mode
        self.azimuth_range = list(azimuth_range)
        self.elevation_range = list(elevation_range)
        self.radius_range = list(radius_range)
        self.delta_azimuth_range = list(delta_azimuth_range)
        self.delta_elevation_range = list(delta_elevation_range)
        self.delta_radius_range = list(delta_radius_range)
        self.elevation_sample_sin = elevation_sample_sin
        self.trajectory = trajectory
        self.move_time = int(move_time)
        self.camera_control = camera_control
        self.motion_bucket_range = list(motion_bucket_range)
        self.cond_aug = float(cond_aug)
        self.mock_dset_size = int(mock_dset_size)
        self.reverse_prob = float(reverse_prob)
        self.spread_radius = int(spread_radius)
        self.render_width = int(render_width)
        self.render_height = int(render_height)
        self.seed = int(seed)

        self.avail_views = 16
        self.avail_fps = 24
        self.next_example = None
        self.max_retries = 100
        self.reproject_rgbd = False

    def set_next_example(self, *args):
        """Deterministic eval override: [scene_idx, frame_skip, frame_start,
        reverse, azimuth_start, azimuth_end, elevation_start, elevation_end,
        radius_start, radius_end] (kubric_arbit.py:99-108)."""
        self.next_example = list(args)

    def __len__(self):
        return self.mock_dset_size

    # -- sampling ----------------------------------------------------------

    def _sample_start(self, rng):
        az0, az1 = self.azimuth_range
        azimuth = az0 if az1 - az0 <= 0 else rng.uniform(az0, az1)
        el0, el1 = self.elevation_range
        if el1 - el0 <= 0:
            elevation = el0
        elif self.elevation_sample_sin:
            bounds = np.sin(np.deg2rad([el0, el1]))
            elevation = np.rad2deg(np.arcsin(rng.uniform(*bounds)))
        else:
            elevation = rng.uniform(el0, el1)
        r0, r1 = self.radius_range
        radius = r0 if r1 - r0 <= 0 else rng.uniform(r0, r1)
        return azimuth, elevation, radius

    def _sample_end(self, rng, azimuth_start, elevation_start, radius_start):
        da = self.delta_azimuth_range
        if da[1] - da[0] <= 0:
            azimuth_end = azimuth_start + da[0]
        elif self.azimuth_range[1] - self.azimuth_range[0] >= 360.0:
            azimuth_end = azimuth_start + rng.uniform(*da)
        else:
            azimuth_end = rng.uniform(
                max(azimuth_start + da[0], self.azimuth_range[0]),
                min(azimuth_start + da[1], self.azimuth_range[1]),
            )
        de = self.delta_elevation_range
        if len(de) != 2:
            elevation_end = de[0]  # absolute
        elif de[1] - de[0] <= 0:
            elevation_end = elevation_start + de[0]
        else:
            elevation_end = rng.uniform(
                max(elevation_start + de[0], self.elevation_range[0]),
                min(elevation_start + de[1], self.elevation_range[1]),
            )
        dr = self.delta_radius_range
        if len(dr) != 2:
            radius_end = dr[0]  # absolute
        elif dr[1] - dr[0] <= 0:
            radius_end = radius_start + dr[0]
        else:
            radius_end = rng.uniform(
                max(radius_start + dr[0], self.radius_range[0]),
                min(radius_start + dr[1], self.radius_range[1]),
            )
        return azimuth_end, elevation_end, radius_end

    def sample_trajectories(self, rng, spherical_start=None, spherical_end=None):
        """(kubric_arbit.py:262-408). Returns spherical + extrinsics
        trajectories and the normalized motion amount."""
        tcm = self.model_frames
        assert self.input_mode == "arbitrary" and self.output_mode == "arbitrary"

        if self.next_example is not None and len(self.next_example) > 4 and \
                self.next_example[4] > -1000:
            (azimuth_start, azimuth_end, elevation_start, elevation_end,
             radius_start, radius_end) = [float(v) for v in self.next_example[4:10]]
            # Reference arg order: az_s, az_e, el_s, el_e, r_s, r_e
        else:
            if spherical_start is None:
                azimuth_start, elevation_start, radius_start = self._sample_start(rng)
            else:
                azimuth_start, elevation_start, radius_start = spherical_start
            if spherical_end is None:
                azimuth_end, elevation_end, radius_end = self._sample_end(
                    rng, azimuth_start, elevation_start, radius_start
                )
            else:
                azimuth_end, elevation_end, radius_end = spherical_end

        spherical_start = np.array(
            [azimuth_start, elevation_start, radius_start], dtype=np.float32)
        spherical_end = np.array(
            [azimuth_end, elevation_end, radius_end], dtype=np.float32)

        my_motion = np.linalg.norm(spherical_end[0:2] - spherical_start[0:2])
        max_motion = np.linalg.norm([
            max(*self.delta_azimuth_range), max(*self.delta_elevation_range)])
        motion_amount = float(my_motion / max_motion) if max_motion > 0 else 0.0

        spherical_src, spherical_dst = common.construct_trajectory(
            spherical_start, spherical_end, self.trajectory, tcm, self.move_time)

        position_src = geometry.cartesian_from_spherical(spherical_src, deg2rad=True)
        position_src[..., 2] += 1.0
        position_dst = geometry.cartesian_from_spherical(spherical_dst, deg2rad=True)
        position_dst[..., 2] += 1.0
        look_at = np.array([0.0, 0.0, 1.0])

        extrinsics_src = np.stack(
            [geometry.extrinsics_from_look_at(position_src[t], look_at)
             for t in range(tcm)]).astype(np.float32)
        extrinsics_dst = np.stack(
            [geometry.extrinsics_from_look_at(position_dst[t], look_at)
             for t in range(tcm)]).astype(np.float32)

        return (spherical_start, spherical_end,
                spherical_src.astype(np.float32), spherical_dst.astype(np.float32),
                extrinsics_src, extrinsics_dst, motion_amount)

    # -- rendering ---------------------------------------------------------

    def _used_intrinsics(self, norm_intrinsics: np.ndarray) -> np.ndarray:
        """Scale normalized K to render resolution + aspect-ratio crop fix
        (kubric_arbit.py:435-450)."""
        k = norm_intrinsics.copy()
        k[0, :] *= self.render_width
        k[1, :] *= self.render_height
        old_ar = 576.0 / 384.0
        new_ar = self.render_width / self.render_height
        if new_ar > old_ar + 1e-3:
            k[1, 1] = k[0, 0]
        elif new_ar < old_ar - 1e-3:
            k[0, 0] = k[1, 1]
        return k

    def _render_traj_frame(self, xyz, rgb, intrinsics, extrinsics,
                           blur_radius=21):
        img = geometry.render_point_cloud(
            xyz, rgb, intrinsics, extrinsics,
            self.render_height, self.render_width,
            spread_radius=self.spread_radius, mode="kubric",
            blur_kernel=blur_radius,
        )
        img = common.process_image(
            img, center_crop=False,
            frame_width=self.frame_width, frame_height=self.frame_height,
        )  # bilinear resize + [-1,1]
        return img

    def synth_src_dst_rgb(self, pcl_frames, extrinsics_src, extrinsics_dst,
                          avail_intrinsics, avail_extrinsics):
        """Render both trajectories from merged clouds (kubric_arbit.py:410-560).
        pcl_frames: list of (xyz (V,N,3) f16, rgb (V,N,3) u8) per frame."""
        tcm = self.model_frames
        used_k = self._used_intrinsics(avail_intrinsics[0])
        rgb_src, rgb_dst, reproject = [], [], ([] if self.reproject_rgbd else None)

        for t in range(tcm):
            xyz, rgb = pcl_frames[t][0], pcl_frames[t][1]
            xyz_flat = xyz.reshape(-1, 3).astype(np.float32)
            rgb_flat = (rgb.reshape(-1, 3).astype(np.float32)) / 255.0
            rgb_src.append(self._render_traj_frame(
                xyz_flat, rgb_flat, used_k, extrinsics_src[t]))
            rgb_dst.append(self._render_traj_frame(
                xyz_flat, rgb_flat, used_k, extrinsics_dst[t]))
            if reproject is not None:
                # RGBD-reprojection baseline from stored view 4 — the first
                # "dense low down" viewpoint (kubric_arbit.py:508-545);
                # clamped for reduced-view test fixtures.
                v = 4 if xyz.shape[0] > 4 else 0
                src_xyz = xyz[v].astype(np.float32)
                src_rgb = rgb[v].astype(np.float32) / 255.0
                img = geometry.render_point_cloud(
                    src_xyz, src_rgb, used_k, extrinsics_dst[t],
                    self.render_height, self.render_width,
                    spread_radius=self.spread_radius, mode="kubric",
                    blur_kernel=3,
                )
                reproject.append(common.process_image(
                    img, False, self.frame_width, self.frame_height))

        rgb_src = np.stack(rgb_src)
        rgb_dst = np.stack(rgb_dst)
        if reproject is not None:
            reproject = np.stack(reproject)
        return rgb_src, rgb_dst, reproject

    # -- batch dict --------------------------------------------------------

    def construct_dict(self, rng, rgb_src, rgb_dst, reproject, fps,
                       spherical_src, spherical_dst,
                       extrinsics_src, extrinsics_dst, motion_amount) -> Dict:
        """(kubric_arbit.py:565-648). All per-frame arrays are (Tcm, ...)."""
        tcm = self.model_frames
        tci, tco = self.input_frames, self.output_frames

        cond_aug = np.full((tcm,), self.cond_aug, dtype=np.float32)
        m0, m1 = self.motion_bucket_range
        motion_value = int(m0) if m1 - m0 <= 0 else int(
            round(m0 + (m1 - m0) * motion_amount))
        motion_bucket_id = np.full((tcm,), motion_value, dtype=np.int32)
        fps_id = np.full((tcm,), fps, dtype=np.int32)
        image_only_indicator = np.zeros((1, tcm), dtype=np.float32)

        scaled_rel_pose = np.zeros((tcm, 3, 4), dtype=np.float32)
        for t in range(tcm):
            delta = np.linalg.inv(extrinsics_src[t]) @ extrinsics_dst[t]
            scaled_rel_pose[t] = delta[0:3, 0:4]

        scaled_rel_angles = (spherical_dst - spherical_src).astype(np.float32)
        scaled_rel_angles[:, 0] *= np.pi / 180.0
        scaled_rel_angles[:, 1] *= np.pi / 180.0

        data = {
            "cond_aug": cond_aug,
            "motion_bucket_id": motion_bucket_id,
            "fps_id": fps_id,
            "image_only_indicator": image_only_indicator,
            "scaled_relative_pose": scaled_rel_pose,
            "scaled_relative_angles": scaled_rel_angles,
        }

        if rgb_src is not None and rgb_dst is not None:
            target_frames = rgb_dst
            if tco < tcm:
                target_frames = np.concatenate(
                    [target_frames[0:tco]]
                    + [target_frames[tco - 1:tco]] * (tcm - tco), axis=0)
            cond_no_noise = rgb_src
            if tci < tcm:
                cond_no_noise = np.concatenate(
                    [cond_no_noise[0:tci]]
                    + [cond_no_noise[tci - 1:tci]] * (tcm - tci), axis=0)
            assert target_frames.shape[1:3] == (self.frame_height, self.frame_width)
            cond_frames = (
                cond_no_noise
                + self.cond_aug * rng.standard_normal(cond_no_noise.shape)
            ).astype(np.float32)
            data["jpg"] = target_frames.astype(np.float32)
            data["cond_frames"] = cond_frames
            data["cond_frames_without_noise"] = cond_no_noise.astype(np.float32)

        if reproject is not None:
            data["reproject"] = reproject.astype(np.float32)
        return data

    # -- main --------------------------------------------------------------

    def __getitem__(self, idx: int) -> Dict:
        tv, tcm = self.avail_frames, self.model_frames
        for retry_idx in range(self.max_retries):
            rng = np.random.default_rng((self.seed, int(idx), retry_idx))
            try:
                if self.next_example is not None:
                    scene_idx = int(self.next_example[0])
                    frame_skip = int(self.next_example[1])
                    frame_start = int(self.next_example[2])
                    reverse = bool(self.next_example[3])
                else:
                    if retry_idx >= 1 or self.force_shuffle:
                        idx2 = rng.integers(0, self.mock_dset_size)
                        idx = int((idx2 + idx) % self.mock_dset_size)
                    scene_idx = idx % self.num_scenes + self.start_idx
                    max_skip = tv // tcm
                    frame_skip = int(rng.integers(1, max_skip + 1))
                    desired_max_offset = 6
                    cover_video = frame_skip * (tcm - 1) + 1
                    max_frame_start = tv - cover_video - 1
                    used_max = max(min(max_frame_start, desired_max_offset), 0)
                    frame_start = int(rng.integers(0, used_max + 1))
                    reverse = bool(rng.random() < self.reverse_prob)

                scene_dp = os.path.join(self.dset_root, f"scn{scene_idx:05d}")
                scene_dn = os.path.basename(scene_dp)
                pcl_dp = os.path.join(self.pcl_root, f"scn{scene_idx:05d}")

                fps = int(round(self.avail_fps / frame_skip))
                clip_frames = np.arange(tcm) * frame_skip + frame_start
                if scene_idx >= 0:
                    assert 0 <= clip_frames[0] and clip_frames[-1] <= tv - 1
                if reverse:
                    clip_frames = clip_frames[::-1].copy()

                if scene_idx >= 0:
                    metadata = common.load_json(
                        os.path.join(scene_dp, f"{scene_dn}_p0_v4.json"))
                    first_intrinsics, first_extrinsics = \
                        geometry.get_kubric_camera_matrices(metadata)
                    pcl_frames = [
                        load_point_cloud_file(
                            os.path.join(pcl_dp, f"pcl_rgb_segm_{t:05d}.pt"))
                        for t in clip_frames
                    ]
                else:
                    metadata, pcl_frames = None, None
                    first_intrinsics = first_extrinsics = None

                (spherical_start, spherical_end, spherical_src, spherical_dst,
                 extrinsics_src, extrinsics_dst, motion_amount) = \
                    self.sample_trajectories(rng)

                if scene_idx >= 0:
                    rgb_src, rgb_dst, reproject = self.synth_src_dst_rgb(
                        pcl_frames, extrinsics_src, extrinsics_dst,
                        first_intrinsics, first_extrinsics)
                else:
                    rgb_src = rgb_dst = reproject = None

                data = self.construct_dict(
                    rng, rgb_src, rgb_dst, reproject, fps,
                    spherical_src, spherical_dst,
                    extrinsics_src, extrinsics_dst, motion_amount)
                break
            except Exception as e:
                common.log_retry("KubricSynthViewDataset", idx, retry_idx,
                                 self.max_retries, e)
                if retry_idx >= self.max_retries - 2:
                    raise
                time.sleep(min(0.2 + retry_idx * 0.02, 1.0))

        data["dset"] = np.array([1])
        data["idx"] = np.array([idx])
        data["scene_idx"] = np.array([scene_idx])
        data["frame_start"] = np.array([frame_start])
        data["frame_skip"] = np.array([frame_skip])
        data["clip_frames"] = np.asarray(clip_frames)
        return data


@register("sgm.data.kubric_arbit.KubricSynthViewModule")
class KubricSynthViewModule:
    """Train/val split + loader factories (kubric_arbit.py:658-693)."""

    def __init__(self, dset_root, train_videos, val_videos, test_videos,
                 batch_size, num_workers, shuffle=True, **kwargs):
        self.batch_size = int(batch_size)
        self.num_workers = int(num_workers)
        self.shuffle = shuffle
        self.train_dataset = KubricSynthViewDataset(
            dset_root, 0, train_videos, **kwargs)
        self.val_dataset = KubricSynthViewDataset(
            dset_root, train_videos, train_videos + val_videos, **kwargs)

    def train_dataloader(self):
        return PrefetchLoader(
            self.train_dataset, self.batch_size, shuffle=self.shuffle,
            num_workers=self.num_workers)

    def val_dataloader(self):
        return PrefetchLoader(
            self.val_dataset, self.batch_size, shuffle=self.shuffle,
            num_workers=self.num_workers)
