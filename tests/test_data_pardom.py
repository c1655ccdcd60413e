"""ParallelDomain-4D pipeline tests with synthetic on-disk fixtures."""

import os

import cv2
import numpy as np
import pytest

from gcd_tpu.data.pardom import ParallelDomainSynthViewDataset
from gcd_tpu.data.loader import PrefetchLoader
from gcd_tpu.data import common

T_AVAIL = 50
N_VIEWS = 19  # 16 magic + 3 ego
N_POINTS = 1500
TCM = 3


def _quat_dict(w, x, y, z):
    return {"qw": w, "qx": x, "qy": y, "qz": z}


@pytest.fixture(scope="module")
def fake_pd_root(tmp_path_factory):
    import torch

    root = tmp_path_factory.mktemp("pd4d")
    dset_root = root / "data"
    pcl_root = root / "pcl"
    scene = dset_root / "scene_000000"
    (scene / "calibration").mkdir(parents=True)
    (scene / "ontology").mkdir()
    pcl_scene = pcl_root / "scene_000000"
    pcl_scene.mkdir(parents=True)

    names, intr, extr = [], [], []
    for i in range(16):
        names.append(f"camera{i}")
        intr.append({"fx": 400.0, "fy": 400.0, "cx": 320.0, "cy": 240.0})
        extr.append({"rotation": _quat_dict(1.0, 0, 0, 0),
                     "translation": {"x": -42.0, "y": 0.0, "z": 6.0}})
    for nm in ("yaw-0", "yaw-60", "yaw-neg-60"):
        names.append(nm)
        intr.append({"fx": 500.0, "fy": 500.0, "cx": 320.0, "cy": 240.0})
        extr.append({"rotation": _quat_dict(1.0, 0, 0, 0),
                     "translation": {"x": 1.6, "y": 0.0, "z": 1.55}})
    common.save_json({"names": names, "intrinsics": intr, "extrinsics": extr},
                     str(scene / "calibration" / "calib.json"))

    items = [{"id": i, "color": {"r": (i * 37) % 256, "g": (i * 91) % 256,
                                 "b": (i * 53) % 256}} for i in range(30)]
    common.save_json({"items": items}, str(scene / "ontology" / "onto.json"))

    rng = np.random.default_rng(0)
    # ego RGB frames for input_mode=ego_forward (view yaw-0)
    rgb_dir = scene / "rgb" / "yaw-0"
    rgb_dir.mkdir(parents=True)
    for t in range(T_AVAIL):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(rgb_dir / f"{t * 10 + 5:018d}.png"), img[..., ::-1])

    for t in range(T_AVAIL):
        xyz = rng.normal(size=(N_VIEWS, N_POINTS, 3)).astype(np.float16) * 6
        xyz[..., 2] = np.abs(xyz[..., 2])  # above ground
        rgb = rng.integers(0, 255, (N_VIEWS, N_POINTS, 3), dtype=np.uint8)
        segm = rng.integers(0, 30, (N_VIEWS, N_POINTS, 1), dtype=np.uint8)
        tag = np.full((N_VIEWS, N_POINTS, 1), 0, dtype=np.uint8)
        torch.save([torch.from_numpy(xyz), torch.from_numpy(rgb),
                    torch.from_numpy(segm), torch.from_numpy(tag)],
                   str(pcl_scene / f"pcl_rgb_segm_{t * 10 + 5:06d}.pt"))
    return str(dset_root), str(pcl_root)


def _make_dataset(fake_pd_root, **over):
    dset_root, pcl_root = fake_pd_root
    kwargs = dict(
        dset_root=dset_root, split="train", start_idx=0, end_idx=1,
        pcl_root=pcl_root, model_frames=TCM, input_frames=TCM,
        output_frames=TCM, frame_width=96, frame_height=64,
        render_width=104, render_height=72, move_time=2,
        mock_dset_size=4, trajectory="interpol_sine",
    )
    kwargs.update(over)
    return ParallelDomainSynthViewDataset(**kwargs)


def test_ego_forward_topdown1_rgb(fake_pd_root):
    ds = _make_dataset(fake_pd_root)
    ex = ds[0]
    assert ex["jpg"].shape == (TCM, 64, 96, 3)
    assert ex["cond_frames"].shape == (TCM, 64, 96, 3)
    assert np.abs(ex["jpg"]).max() > 0.05
    # ego_forward loads from disk; topdown1 renders from clouds.
    assert int(ex["src_view_idx"][0]) == -1
    assert ex["scaled_relative_angles"].shape == (TCM, 3)
    np.testing.assert_allclose(ex["scaled_relative_angles"], 0.0)  # topdown1


def test_semantic_output_modality(fake_pd_root):
    ds = _make_dataset(fake_pd_root, output_modality="segm", modal_time=0)
    ex = ds[0]
    assert ex["jpg"].shape == (TCM, 64, 96, 3)
    assert np.isfinite(ex["jpg"]).all()


def test_modal_time_interpolates_rgb_to_segm(fake_pd_root):
    ds = _make_dataset(fake_pd_root, output_modality="segm", modal_time=3)
    xyz = np.zeros((1, 10, 3), dtype=np.float16)
    rgb = np.full((1, 10, 3), 200, dtype=np.uint8)
    segm = np.full((1, 10, 1), 5, dtype=np.uint8)
    c0 = ds._point_colors(0, rgb, segm)
    c1 = ds._point_colors(1, rgb, segm)
    c9 = ds._point_colors(9, rgb, segm)
    np.testing.assert_allclose(c0, 200 / 255.0)  # frame 0: pure rgb
    seg_col = ds.ontology["semantic_id_rgb_map"][5]
    np.testing.assert_allclose(c9[0, 0], seg_col, atol=1e-6)  # late: pure segm
    expected = (2 / 3) * (200 / 255.0) + (1 / 3) * seg_col
    np.testing.assert_allclose(c1[0, 0], expected, atol=1e-6)


def test_topdown2_azimuth_parameterization(fake_pd_root):
    ds = _make_dataset(fake_pd_root, output_mode="topdown2",
                       dst_azimuth_range=[-60.0, 60.0])
    ex = ds[0]
    az = ex["scaled_relative_angles"][0, 0]
    assert -np.deg2rad(60) - 1e-6 <= az <= np.deg2rad(60) + 1e-6


def test_magic_opposite_mode(fake_pd_root):
    # magic frames exist only for the pcl; magic_opposite loads from disk, so
    # create frames for all magic cameras lazily here for view coverage.
    dset_root, _ = fake_pd_root
    rng = np.random.default_rng(1)
    for i in range(16):
        d = os.path.join(dset_root, "scene_000000", "rgb", f"camera{i}")
        os.makedirs(d, exist_ok=True)
        for t in range(T_AVAIL):
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(d, f"{t * 10 + 5:018d}.png"), img[..., ::-1])
    ds = _make_dataset(fake_pd_root, input_mode="magic_random",
                       output_mode="magic_opposite", move_time=0)
    ex = ds[0]
    src, dst = int(ex["src_view_idx"][0]), int(ex["dst_view_idx"][0])
    assert dst == (src + 8) % 16
    np.testing.assert_allclose(ex["scaled_relative_angles"][:, 0], np.pi)


def test_traffic1_modes(fake_pd_root):
    ds = _make_dataset(fake_pd_root, input_mode="traffic1",
                       output_mode="traffic1", dst_azimuth_range=[-90.0, 90.0])
    ex = ds[0]
    assert ex["jpg"].shape == (TCM, 64, 96, 3)
    az = ex["scaled_relative_angles"][0, 0]
    assert -np.pi / 2 - 1e-6 <= az <= np.pi / 2 + 1e-6


def test_loader_batch(fake_pd_root):
    ds = _make_dataset(fake_pd_root)
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2)
    batch = next(iter(loader))
    assert batch["jpg"].shape == (2 * TCM, 64, 96, 3)
    assert batch["num_video_frames"] == TCM
