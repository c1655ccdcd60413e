"""Kubric-4D pipeline tests with synthetic on-disk fixtures (the rebuild's
equivalent of the reference's mock-renderer strategy, SURVEY.md section 4.5)."""

import os

import numpy as np
import pytest

from gcd_tpu.data.kubric import KubricSynthViewDataset, load_point_cloud_file
from gcd_tpu.data.loader import PrefetchLoader, collate_fn
from gcd_tpu.data import common

T_AVAIL = 20
N_VIEWS = 4
N_POINTS = 3000


@pytest.fixture(scope="module")
def fake_kubric_root(tmp_path_factory):
    """Build one fake scene: metadata json + per-frame point clouds of a
    colorful ball of points around the origin."""
    import torch

    root = tmp_path_factory.mktemp("kubric4d")
    dset_root = root / "data"
    pcl_root = root / "pcl"
    scene_data = dset_root / "scn00000"
    scene_pcl = pcl_root / "scn00000"
    scene_data.mkdir(parents=True)
    scene_pcl.mkdir(parents=True)

    rng = np.random.default_rng(0)
    metadata = {
        "scene": {"num_frames": T_AVAIL},
        "camera": {
            "quaternions": [[1.0, 0.0, 0.0, 0.0]] * T_AVAIL,
            "positions": [[0.0, -14.0, 2.0]] * T_AVAIL,
            "K": [[0.875, 0.0, 0.5], [0.0, 1.3125, 0.5], [0.0, 0.0, 1.0]],
        },
    }
    common.save_json(metadata, str(scene_data / "scn00000_p0_v4.json"))

    for t in range(T_AVAIL):
        # Slowly rotating blob of points near the look-at target [0, 0, 1].
        theta = t * 0.1
        base = rng.normal(size=(N_VIEWS, N_POINTS, 3)) * 1.5
        base[..., 2] += 1.0
        rot = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1.0],
        ])
        xyz = (base @ rot.T).astype(np.float16)
        rgb = rng.integers(0, 255, (N_VIEWS, N_POINTS, 3), dtype=np.uint8)
        segm = rng.integers(0, 10, (N_VIEWS, N_POINTS, 3), dtype=np.uint8)
        torch.save(
            [torch.from_numpy(xyz), torch.from_numpy(rgb), torch.from_numpy(segm)],
            str(scene_pcl / f"pcl_rgb_segm_{t:05d}.pt"),
        )
    return str(dset_root), str(pcl_root)


def _make_dataset(fake_kubric_root, **over):
    dset_root, pcl_root = fake_kubric_root
    kwargs = dict(
        dset_root=dset_root, start_idx=0, end_idx=1, pcl_root=pcl_root,
        avail_frames=T_AVAIL, model_frames=4, input_frames=4, output_frames=4,
        frame_width=96, frame_height=64, render_width=104, render_height=72,
        elevation_sample_sin=True, move_time=3, mock_dset_size=8,
        motion_bucket_range=[0, 255],
    )
    kwargs.update(over)
    return KubricSynthViewDataset(**kwargs)


def test_getitem_contract(fake_kubric_root):
    ds = _make_dataset(fake_kubric_root)
    ex = ds[0]
    t = 4
    assert ex["jpg"].shape == (t, 64, 96, 3)
    assert ex["cond_frames"].shape == (t, 64, 96, 3)
    assert ex["cond_frames_without_noise"].shape == (t, 64, 96, 3)
    assert ex["cond_aug"].shape == (t,)
    assert ex["motion_bucket_id"].shape == (t,)
    assert ex["fps_id"].shape == (t,)
    assert ex["image_only_indicator"].shape == (1, t)
    assert ex["scaled_relative_pose"].shape == (t, 3, 4)
    assert ex["scaled_relative_angles"].shape == (t, 3)
    # frames rendered with content
    assert np.abs(ex["jpg"]).max() > 0.1
    assert ex["jpg"].min() >= -1.0 and ex["jpg"].max() <= 1.0
    # cond_frames = without_noise + cond_aug noise
    diff = ex["cond_frames"] - ex["cond_frames_without_noise"]
    assert 0.001 < diff.std() < 0.1


def test_motion_bucket_syncs_with_camera_motion(fake_kubric_root):
    ds = _make_dataset(fake_kubric_root)
    vals = [ds[i]["motion_bucket_id"][0] for i in range(6)]
    assert len(set(int(v) for v in vals)) > 1  # varies with sampled motion


def test_deterministic_next_example(fake_kubric_root):
    ds = _make_dataset(fake_kubric_root)
    ds.set_next_example(0, 2, 1, False, 30.0, 80.0, 10.0, 30.0, 14.0, 15.0)
    ex1 = ds[0]
    ex2 = ds[0]
    np.testing.assert_allclose(ex1["jpg"], ex2["jpg"])
    np.testing.assert_allclose(
        ex1["scaled_relative_angles"], ex2["scaled_relative_angles"])
    # end-start azimuth delta = 50 deg in radians at the last frame
    np.testing.assert_allclose(
        ex1["scaled_relative_angles"][-1, 0], np.deg2rad(50.0), atol=1e-5)


def test_trajectory_src_static_dst_moves(fake_kubric_root):
    ds = _make_dataset(fake_kubric_root)
    rng = np.random.default_rng(0)
    (s_start, s_end, s_src, s_dst, e_src, e_dst, motion) = \
        ds.sample_trajectories(rng)
    # src trajectory static at start pose
    np.testing.assert_allclose(s_src, np.tile(s_start, (4, 1)), atol=1e-6)
    # dst starts at start pose (move_time>=1 => alpha=0 at t=0), ends at end
    np.testing.assert_allclose(s_dst[0], s_start, atol=1e-5)
    np.testing.assert_allclose(s_dst[-1], s_end, atol=1e-5)
    assert 0.0 <= motion


def test_collate_and_loader(fake_kubric_root):
    ds = _make_dataset(fake_kubric_root)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batch = next(iter(loader))
    assert batch["jpg"].shape == (8, 64, 96, 3)  # (B*T, H, W, 3)
    assert batch["image_only_indicator"].shape == (2, 4)
    assert batch["num_video_frames"] == 4
    assert batch["scaled_relative_angles"].shape == (8, 3)


def test_reverse_and_skip_ranges(fake_kubric_root):
    ds = _make_dataset(fake_kubric_root)
    skips, starts = set(), set()
    for i in range(12):
        ex = ds[i]
        skips.add(int(ex["frame_skip"][0]))
        starts.add(int(ex["frame_start"][0]))
        cf = ex["clip_frames"]
        assert cf.min() >= 0 and cf.max() < T_AVAIL
    assert max(skips) <= T_AVAIL // 4 and min(skips) >= 1


def test_retry_logs_warning(fake_kubric_root, caplog):
    """Failed loads must be visible (VERDICT r2: silent retries on a
    misconfigured pcl_root look like a hang). Matches the reference's
    print-on-failure observability (kubric_arbit.py:124-222)."""
    import logging

    ds = _make_dataset(fake_kubric_root, pcl_root="/nonexistent/pcl",
                       max_retries=4)
    with caplog.at_level(logging.WARNING, logger="gcd_tpu.data"):
        with pytest.raises(Exception):
            ds[0]
    msgs = [r.message for r in caplog.records]
    assert any("KubricSynthViewDataset" in m and "retry" in m for m in msgs)
    # Rate-limited: first 3 retries log verbatim.
    assert len(msgs) >= 3
