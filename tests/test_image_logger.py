"""ImageLogger (engine/image_logger.py): cadence, metadata filenames, and a
real end-to-end log() on the tiny full-stack engine writing mp4 + png."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcd_tpu.engine.image_logger import ImageLogger, _frame_strip
from gcd_tpu.utils.config import instantiate_from_config
from tests.helpers import tiny_engine_config

B, T, H, W = 2, 3, 32, 48


def test_should_log_cadence(tmp_path):
    lg = ImageLogger(str(tmp_path), batch_frequency=100, log_first_step=True)
    assert lg.should_log(0)
    assert not lg.should_log(37)
    assert lg.should_log(100) and lg.should_log(200)
    lg2 = ImageLogger(str(tmp_path), batch_frequency=100, log_first_step=False)
    assert not lg2.should_log(0)
    lg3 = ImageLogger(str(tmp_path), disabled=True)
    assert not lg3.should_log(0) and not lg3.should_log(100)


def test_meta_name_encodes_batch_metadata(tmp_path):
    lg = ImageLogger(str(tmp_path))
    batch = {
        "scene_idx": np.array([42] * T),
        "fps_id": np.array([5] * T),
        "motion_bucket_id": np.array([127] * T),
        "scaled_relative_angles": np.tile(
            np.array([[0.5, -0.25, 1.0]], np.float32), (T, 1)),
    }
    name = lg._meta_name(1234, batch)
    assert "gs-0001234" in name
    assert "scn-42" in name and "fps-5" in name and "mbid-127" in name
    assert "az-0.50" in name and "el--0.25" in name


def test_frame_strip_shape():
    video = np.random.default_rng(0).random((5, 8, 6, 3)).astype(np.float32)
    strip = _frame_strip(video, max_frames=4)
    assert strip.shape == (8, 4 * 6, 3)


@pytest.mark.slow
def test_log_writes_video_and_strip(tmp_path):
    engine = instantiate_from_config(tiny_engine_config())
    batch = engine.example_batch((H, W), T, B)
    params = jax.jit(lambda k: engine.init_params(k, img_hw=(H, W), t=T))(
        jax.random.PRNGKey(0))

    lg = ImageLogger(str(tmp_path), batch_frequency=10, fps=4)
    lg.log(engine, params, batch, global_step=10, key=jax.random.PRNGKey(1))

    mp4s = glob.glob(os.path.join(lg.media_dir, "*_sample.mp4"))
    pngs = glob.glob(os.path.join(lg.media_dir, "*_strip.png"))
    assert len(mp4s) == 1 and len(pngs) == 1
    assert os.path.getsize(mp4s[0]) > 0

    import cv2

    strip = cv2.imread(pngs[0])
    # rows: cond + sampled (+gt if present) stacked vertically per frame
    assert strip is not None and strip.shape[0] % H == 0
    assert strip.shape[0] >= 2 * H
