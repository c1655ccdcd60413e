"""gradio_app.py --once CLI fallback: the demo's inference path (pose
visualization action + run action) on the tiny config with random weights."""

import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _fake_video(path):
    import cv2

    frames = (np.random.default_rng(0).random((6, 32, 48, 3)) * 255
              ).astype(np.uint8)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8, (48, 32))
    for f in frames:
        w.write(f[..., ::-1])
    w.release()


def test_gradio_once(tmp_path):
    import scripts.gradio_app as app

    inp = str(tmp_path / "in.mp4")
    _fake_video(inp)
    out = str(tmp_path / "out")
    app.main([
        "--config_path", "configs/smoke_kubric_tiny.yaml",
        "--model_path", "",
        "--once", inp,
        "--output", out,
        "--num_frames", "3",
        "--num_steps", "2",
        "--frame_width", "48",
        "--frame_height", "32",
        "--azimuth", "20", "--elevation", "10",
    ])
    vids = glob.glob(os.path.join(out, "*.mp4"))
    # demo writes input / output / side-by-side videos
    assert len(vids) >= 2, os.listdir(out)
