"""Geometry tests: camera math invariants + jax-f32 splat vs a float64
reference-semantics implementation (the f64 global-exponent formulation used by
the reference on CUDA)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gcd_tpu.data import geometry as geo


def test_quaternion_identity_and_axes():
    np.testing.assert_allclose(
        geo.quaternion_to_rotation_matrix([1, 0, 0, 0]), np.eye(3), atol=1e-12
    )
    # 90 deg about z: (w=cos45, z=sin45)
    r = geo.quaternion_to_rotation_matrix([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_spherical_roundtrip():
    rng = np.random.default_rng(0)
    s = np.stack(
        [rng.uniform(-np.pi, np.pi, 100), rng.uniform(-1.2, 1.2, 100),
         rng.uniform(1, 20, 100)], axis=-1)
    c = geo.cartesian_from_spherical(s)
    s2 = geo.spherical_from_cartesian(c)
    np.testing.assert_allclose(s, s2, atol=1e-10)


def test_look_at_extrinsics_properties():
    rt = geo.extrinsics_from_look_at([5.0, 3.0, 2.0], [0.0, 0.0, 1.0])
    r = rt[:3, :3]
    # Orthonormal, right-handed (right x down = forward)
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-10)
    fwd = r[:, 2]
    expected_fwd = np.array([-5.0, -3.0, -1.0])
    expected_fwd /= np.linalg.norm(expected_fwd)
    np.testing.assert_allclose(fwd, expected_fwd, atol=1e-10)
    # camera_to_world(world_to_camera(x)) == x
    x = np.random.default_rng(1).normal(size=(10, 3))
    np.testing.assert_allclose(
        geo.camera_to_world(geo.world_to_camera(x, rt), rt), x, atol=1e-9
    )


def test_interpolate_spherical_wraps_azimuth():
    a = geo.cartesian_from_spherical(np.array([np.deg2rad(170.0), 0.3, 10.0]))
    b = geo.cartesian_from_spherical(np.array([np.deg2rad(-170.0), 0.3, 10.0]))
    mid = geo.interpolate_spherical(a, b, 0.5)
    s = geo.spherical_from_cartesian(mid, rad2deg=True)
    # Short way around: through 180, not 0.
    assert abs(abs(s[0]) - 180.0) < 1e-6


def _reference_splat_f64(xyz, rgb, K, RT, H, W, spread_radius, mode):
    """Direct float64 implementation of the reference's math
    (geometry.py:242-346), used as golden output."""
    xyz = xyz.astype(np.float64)
    rgb = rgb.astype(np.float64)
    K = K.astype(np.float64)
    RT = RT.astype(np.float64)
    xyz_cam = (xyz - RT[0:3, 3]) @ RT[0:3, 0:3]
    uvw = xyz_cam @ K.T
    uv = uvw[:, 0:2] / uvw[:, 2:3]
    uv_int = (uv + 0.5).astype(np.int32)
    depth = xyz_cam[:, 2:3]
    mask = ((uv_int[:, 0] >= 0) & (uv_int[:, 0] < W) & (uv_int[:, 1] >= 0)
            & (uv_int[:, 1] < H) & (depth[:, 0] > 0.1))
    rgb_f = rgb[mask]
    uv_f = uv_int[mask]
    depth_f = depth[mask]
    inds = uv_f[:, 1] * W + uv_f[:, 0]
    if mode == "pardom":
        strength = 256.0
        depth_f = np.clip(np.sqrt(depth_f), 0.0, 32.0)
    else:
        strength = 512.0
    depth_norm = depth_f / depth_f.max() * 2.0 - 1.0
    pw = np.exp(-depth_norm * strength)
    wrgb = rgb_f * pw

    denom = np.zeros((H * W, 1))
    numer = np.zeros((H * W, 3))

    def spread_add(tensor, indices, values):
        np.add.at(tensor, indices, values)
        left = spread_radius // 2
        right = (spread_radius + 1) // 2
        for dx in range(-left, right + 1):
            for dy in range(-left, right + 1):
                if dx == 0 and dy == 0:
                    continue
                ix = indices % W + dx
                iy = indices // W + dy
                m = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
                np.add.at(tensor, (iy * W + ix)[m], values[m] * 0.02)

    spread_add(denom, inds, pw)
    spread_add(numer, inds, wrgb)
    denom = denom.reshape(H, W, 1)
    denom[denom <= 0.0] = -1.0
    img = numer.reshape(H, W, 3) / denom
    return np.clip(img, 0.0, 1.0).astype(np.float32)


@pytest.mark.parametrize("mode", ["kubric", "pardom"])
def test_splat_matches_f64_reference(mode):
    rng = np.random.default_rng(42)
    H, W = 24, 32
    n = 4000
    # A plane-ish cloud in front of a camera at origin looking +z
    xyz = np.stack([
        rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
        rng.uniform(4, 40 if mode == "kubric" else 120, n)], axis=-1)
    rgb = rng.uniform(0, 1, (n, 3))
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1.0]])
    RT = np.eye(4)

    golden = _reference_splat_f64(xyz, rgb, K, RT, H, W, 1, mode)

    img, denom = geo.splat_points_to_image(
        jnp.asarray(xyz, dtype=jnp.float32), jnp.asarray(rgb, dtype=jnp.float32),
        jnp.ones((n,), dtype=bool), jnp.asarray(K, dtype=jnp.float32),
        jnp.asarray(RT, dtype=jnp.float32), H, W, spread_radius=1, mode=mode,
    )
    img = np.asarray(img)

    hit = golden.sum(-1) > 0
    assert hit.mean() > 0.3  # sanity: scene covers a chunk of the image
    # f32 with per-pixel shifts vs f64 global exponent: same normalized output.
    np.testing.assert_allclose(img[hit], golden[hit], atol=2e-2)
    # Holes agree exactly.
    np.testing.assert_array_equal(img.sum(-1) == 0, ~hit)


def test_blur_into_black_fills_holes():
    img = np.zeros((16, 16, 3), dtype=np.float32)
    img[4:12, 4:12] = 0.8
    img[7, 7] = 0.0  # a hole inside the bright square
    out = np.asarray(geo.blur_into_black(jnp.asarray(img), kernel_size=5, sigma=1.25))
    assert out[7, 7].mean() > 0.5  # hole filled from neighbors
    assert abs(out[8, 8].mean() - 0.8) < 0.15  # interior roughly preserved


def test_render_point_cloud_end_to_end():
    rng = np.random.default_rng(0)
    n = 5000
    xyz = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                    rng.uniform(5, 15, n)], axis=-1)
    rgb = np.full((n, 3), 0.5)
    K = np.array([[30.0, 0, 16.0], [0, 30.0, 12.0], [0, 0, 1.0]])
    out = geo.render_point_cloud(xyz, rgb, K, np.eye(4), 24, 32,
                                 blur_kernel=5, pad_to_multiple=1 << 12)
    assert out.shape == (24, 32, 3)
    assert np.isfinite(out).all()
    assert out.max() <= 1.0 and out.min() >= 0.0
    assert out.mean() > 0.2
