"""Native (C++/ctypes) point-splat kernel vs the float64 golden implementation
and the jax path. The renderer's depth-exponential z-buffer is globally
chaotic in f32 (a single boundary-pixel flip moves dmax and shifts every
weight), so the strong oracle is the f64 golden from test_geometry — the
native kernel projects in double precision, matching the reference's float64
projection (gcd-model/sgm/data/geometry.py:257)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gcd_tpu import native
from gcd_tpu.data import geometry as geo
from tests.test_geometry import _reference_splat_f64

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain for native splat")


@pytest.mark.parametrize("mode", ["kubric", "pardom"])
def test_native_matches_f64_golden(mode):
    rng = np.random.default_rng(42)
    H, W = 24, 32
    n = 4000
    xyz = np.stack([
        rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
        rng.uniform(4, 40 if mode == "kubric" else 120, n)], axis=-1)
    rgb = rng.uniform(0, 1, (n, 3))
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1.0]])
    RT = np.eye(4)

    golden = _reference_splat_f64(xyz, rgb, K, RT, H, W, 1, mode)
    img = native.splat_points_native(
        xyz.astype(np.float32), rgb.astype(np.float32),
        K.astype(np.float32), RT.astype(np.float32), H, W,
        spread_radius=1, mode=mode)

    hit = golden.sum(-1) > 0
    assert hit.mean() > 0.3
    np.testing.assert_allclose(img[hit], golden[hit], atol=2e-2)
    assert np.abs(img[hit] - golden[hit]).mean() < 1e-3
    np.testing.assert_array_equal(img.sum(-1) == 0, ~hit)


def test_native_matches_jax_small_scene():
    """On a small well-separated scene the f32 jax path and the native path
    agree to float noise (no boundary/dmax ties)."""
    rng = np.random.default_rng(1)
    n = 64
    xyz = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(4, 12, n)], axis=-1).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = np.array([[10.0, 0, 8], [0, 10.0, 6], [0, 0, 1]], np.float32)
    RT = np.eye(4, dtype=np.float32)
    H, W = 12, 16

    img_j, w_j = geo.splat_points_to_image(
        jnp.asarray(xyz), jnp.asarray(rgb), jnp.ones((n,), bool),
        jnp.asarray(K), jnp.asarray(RT), H, W, spread_radius=1, mode="kubric")
    img_n, w_n = native.splat_points_native(
        xyz, rgb, K, RT, H, W, spread_radius=1, mode="kubric",
        return_weight=True)
    np.testing.assert_allclose(img_n, np.asarray(img_j), atol=1e-5)
    np.testing.assert_allclose(w_n, np.asarray(w_j), rtol=1e-4, atol=1e-5)


def test_native_blur_matches_jax():
    rng = np.random.default_rng(2)
    img = rng.uniform(0.2, 1.0, (24, 32, 3)).astype(np.float32)
    img[6:12, 8:16] = 0.0   # a hole block
    img[0:3, :] = 0.0       # border hole
    out_j = np.asarray(geo.blur_into_black(jnp.asarray(img), kernel_size=9,
                                           sigma=9 / 4.0))
    out_n = native.blur_into_black_native(img, kernel_size=9)
    np.testing.assert_allclose(out_n, out_j, atol=1e-4)


def test_render_point_cloud_prefers_native(monkeypatch):
    """render_point_cloud must route through the native kernel when available
    and produce a valid image."""
    calls = {}
    orig = native.splat_points_native

    def spy(*a, **k):
        calls["native"] = True
        return orig(*a, **k)

    monkeypatch.setattr(native, "splat_points_native", spy)
    rng = np.random.default_rng(0)
    n = 5000
    xyz = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                    rng.uniform(5, 15, n)], axis=-1)
    rgb = np.full((n, 3), 0.5)
    K = np.array([[30.0, 0, 16.0], [0, 30.0, 12.0], [0, 0, 1.0]])
    out = geo.render_point_cloud(xyz, rgb, K, np.eye(4), 24, 32, blur_kernel=5)
    assert calls.get("native")
    assert out.shape == (24, 32, 3)
    assert np.isfinite(out).all() and 0.0 <= out.min() and out.max() <= 1.0
