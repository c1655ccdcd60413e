"""Rich eval galleries + per-frame clip metrics (reference test.py:346-805)."""

import numpy as np
import pytest

from gcd_tpu.utils.metrics import clip_metrics
from scripts import galleries

T, H, W = 3, 32, 48


@pytest.fixture(scope="module")
def example():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    s0 = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(np.float32)
    s1 = np.clip(gt + rng.normal(0, 0.10, gt.shape), 0, 1).astype(np.float32)
    reproject = gt.copy()
    reproject[:, : H // 2] = 0.0  # top half "occluded" (splat holes)
    inp = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    return inp, gt, [s0, s1], reproject


def test_clip_metrics_shapes_and_ordering(example):
    _, gt, samples, reproject = example
    md, unc = clip_metrics(samples, gt, reproject)

    assert md["frame_psnr"].shape == (2, T)
    assert md["frame_ssim"].shape == (2, T)
    assert md["frame_psnr_vis"].shape == (2, T)
    assert md["frame_diversity"].shape == (T,)
    assert unc.shape == (T, H, W)
    assert md["mean_psnr"].shape == (2,)
    # sample 0 has less noise -> strictly better PSNR, and every frame PSNR
    # is finite/positive
    assert (md["mean_psnr"][0] > md["mean_psnr"][1]).all()
    assert np.isfinite(md["frame_psnr"]).all()
    assert 0.0 < md["mean_diversity"] < 1.0


def test_clip_metrics_no_reproject_single_sample(example):
    _, gt, samples, _ = example
    md, unc = clip_metrics(samples[:1], gt)
    assert "frame_psnr_vis" not in md
    assert md["frame_diversity"].sum() == 0.0  # one sample -> no diversity
    assert (unc == 0).all()


def test_create_visualizations_layouts(example):
    inp, gt, samples, reproject = example
    md, unc = clip_metrics(samples, gt, reproject)
    latents = [np.random.default_rng(i).normal(
        size=(T, H // 8, W // 8, 4)).astype(np.float32) for i in range(2)]

    vis = galleries.create_visualizations(
        inp, gt, samples, md, uncertainty=unc, reproject_rgb=reproject,
        pred_samples_latent=latents, model_name="m",
        target_title="Target (A 30.0 E 0.0 R 0.0)",
        enable=("rich1", "rich2", "rich3", "rich4", "rich5", "rich6",
                "rich7"))

    assert set(vis) == {f"rich{i}" for i in range(1, 8)}
    band = galleries.BAND
    for name, video in vis.items():
        assert video.shape[0] == T + 3  # loop-pause padding
        assert video.dtype == np.float32
        assert 0.0 <= video.min() and video.max() <= 1.0
    # layout geometry: rich1 with S=2 is 2x2 panels, rich3/4/7 add a column
    assert vis["rich1"].shape[1:3] == (2 * (H + band), 2 * W)
    assert vis["rich2"].shape[1:3] == (H + band, 2 * W)
    for wide in ("rich3", "rich4", "rich7"):
        assert vis[wide].shape[1:3] == (2 * (H + band), 3 * W)
    for two_col in ("rich5", "rich6"):
        assert vis[two_col].shape[1:3] == (2 * (H + band), 2 * W)


def test_create_visualizations_minimal(example):
    """S=1, no reproject/uncertainty/latents -> only rich1/2/3 possible."""
    inp, gt, samples, _ = example
    md, unc = clip_metrics(samples[:1], gt)
    vis = galleries.create_visualizations(inp, gt, samples[:1], md,
                                          uncertainty=unc)
    assert set(vis) == {"rich1", "rich2", "rich3"}
    # rich1 at S=1 keeps the 2x2 grid with an empty bottom-right panel
    assert vis["rich1"].shape[2] == 2 * W


def test_gallery_selection_can_disable_rich1(example):
    """--galleries must be able to turn the (expensive, default) rich1 off;
    rich2/3 still render — they carve panels out of the rich1 canvas, which
    is built internally but not saved."""
    inp, gt, samples, _ = example
    md, unc = clip_metrics(samples[:1], gt)
    vis = galleries.create_visualizations(inp, gt, samples[:1], md,
                                          uncertainty=unc,
                                          enable=("rich2", "rich3"))
    assert set(vis) == {"rich2", "rich3"}


def test_save_visualizations(tmp_path, example):
    import os

    inp, gt, samples, reproject = example
    md, unc = clip_metrics(samples, gt, reproject)
    vis = galleries.create_visualizations(
        inp, gt, samples, md, uncertainty=unc, reproject_rgb=reproject)
    galleries.save_visualizations(vis, str(tmp_path), "scn0_sample_00",
                                  frame_rate=4)
    names = sorted(os.listdir(tmp_path))
    assert "scn0_sample_00_gal.mp4" in names
    assert "scn0_sample_00_io.mp4" in names
    assert "scn0_sample_00_err.mp4" in names
    assert "scn0_sample_00_div.mp4" in names
    assert "scn0_sample_00_proj.mp4" in names


def test_controls_friendly_title():
    c = {"spherical_start": [0.0, 10.0, 15.0],
         "spherical_end": [30.0, 10.0, 15.0]}
    assert galleries.controls_friendly_title(c) == "A 30.0 E 0.0 R 0.0"
    c2 = {"frame_start": 7, "frame_skip": 2}
    assert galleries.controls_friendly_title(c2) == "FS 7"


def test_camera_visualizer_traces():
    """Backend-free figure content (reference eval_utils.py:679-838)."""
    from scripts.eval_utils import CameraVisualizer, calc_cam_cone_pts_3d

    vis = CameraVisualizer()
    vis.azimuth_change(30.0)
    vis.polar_change(15.0)
    vis.radius_change(0.25)
    assert vis.build_traces()["cones"] == []  # no image -> empty figure

    img = (np.random.default_rng(0).uniform(0, 255, (32, 48, 3))
           .astype(np.uint8))
    vis.encode_image(img)
    tr = vis.build_traces()
    assert tr["surface"]["surfacecolor"].shape == (32, 48)
    # WEB palette: 216 colors (+ PIL padding, version-dependent)
    assert len(tr["surface"]["colorscale"]) >= 216
    assert [c["legend"] for c in tr["cones"]] == ["Input view", "Target view"]
    for cone in tr["cones"]:
        assert len(cone["segments"]) == 8  # apex->4 corners + 4 rim edges

    # input cone sits at base radius on the +x axis; target cone is rotated
    # by the azimuth and pushed out by the zoom offset
    inp = np.asarray(tr["cones"][0]["apex"])
    out = np.asarray(tr["cones"][1]["apex"])
    np.testing.assert_allclose(inp, [2.5, 0.0, 0.0], atol=1e-12)
    r_out = 2.5 + 0.25 * 1.5
    np.testing.assert_allclose(np.linalg.norm(out), r_out, rtol=1e-12)
    assert out[2] < 0  # positive polar -> reference flips the sign

    # frustum corner offsets are unit length off the apex
    pts = calc_cam_cone_pts_3d(15.0, 30.0, 2.5, 50.0)
    d = np.linalg.norm(pts[1:] - pts[0], axis=-1)
    np.testing.assert_allclose(d, 1.0, rtol=1e-12)

    # update_figure degrades to the trace dict when plotly is absent
    fig = vis.update_figure()
    try:
        import plotly  # noqa: F401

        assert type(fig).__name__ == "Figure"
    except ImportError:
        assert fig.keys() == tr.keys()
