"""Camera math + point-splat rendering for on-the-fly training-pair synthesis.

Behavioral reference: gcd-model/sgm/data/geometry.py. The reference renders
merged point clouds with a float64 depth-exponential soft z-buffer on a
dedicated CUDA GPU (project_points_to_pixels :242, spreaded_index_add :340).

TPU-first redesign of the splat:
  * float32 end-to-end. The reference needs f64 only because it exponentiates
    a *globally* normalized depth with strength up to 512 (exp(±512) overflows
    f32). Here the exponent is shifted by a per-pixel max (scatter-max first,
    classic log-sum-exp), which leaves every per-pixel weight in (0, 1] — the
    normalized output is mathematically identical (the ratio per pixel is
    invariant to the shift) with far better conditioning.
  * fully jittable: points are masked (weight zero) instead of boolean-filtered,
    so shapes stay static; callers pad clouds to bucketed sizes.
  * neighbor spreading (radius r, 0.02 weight) is expressed as extra
    scatter contributions per offset — identical semantics to
    spreaded_index_add, including the border masking.

The camera/trajectory math stays host-side numpy (tiny), matching the
reference formulas exactly.
"""

from __future__ import annotations

import functools
import threading
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Loader worker threads call the jitted splat concurrently; serializing the
# dispatch avoids a rare jax-CPU deadlock observed when multiple Python threads
# execute first-compile + device-to-host transfers simultaneously (XLA still
# parallelizes each render internally across cores, so throughput is
# unaffected).
_RENDER_LOCK = threading.Lock()


def _render_device():
    """Point-splat rendering runs on the host CPU backend whenever the default
    backend is an accelerator — the TPU-native analogue of the reference's
    dedicated data GPU (SURVEY.md section 2.8): input-pipeline rendering must
    not steal cycles from the training chip. Returns None to use the default
    device when no separate CPU backend exists."""
    try:
        if jax.default_backend() in ("tpu", "axon", "gpu", "cuda"):
            return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        pass
    return None

# ---------------------------------------------------------------------------
# Quaternions / camera matrices (numpy, host-side)
# ---------------------------------------------------------------------------


def quaternion_to_rotation_matrix(q) -> np.ndarray:
    """(w, x, y, z) unit quaternion -> (3, 3) rotation matrix (replaces the
    reference's pyquaternion dependency)."""
    w, x, y, z = [float(v) for v in q]
    n = np.sqrt(w * w + x * x + y * y + z * z)
    if n == 0:
        return np.eye(3)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def get_kubric_camera_matrices(metadata) -> Tuple[np.ndarray, np.ndarray]:
    """(geometry.py:28-65): per-frame K (normalized) and extrinsics with Y/Z
    camera-axis columns negated."""
    t_total = metadata["scene"]["num_frames"]
    all_extrinsics = np.zeros((t_total, 4, 4), dtype=np.float32)
    all_intrinsics = np.zeros((t_total, 3, 3), dtype=np.float32)
    for t in range(t_total):
        rot_q = np.asarray(metadata["camera"]["quaternions"][t])
        rot_t = np.asarray(metadata["camera"]["positions"][t])
        rot_m = quaternion_to_rotation_matrix(rot_q)
        ext = np.eye(4, dtype=np.float32)
        ext[0:3, 0:3] = rot_m
        ext[0:3, 3] = rot_t
        ext[0:3, 1] *= -1.0
        ext[0:3, 2] *= -1.0
        all_extrinsics[t] = ext
        all_intrinsics[t] = np.abs(np.asarray(metadata["camera"]["K"], dtype=np.float32))
    return all_intrinsics, all_extrinsics


def get_pardom_intrinsics_matrix(d) -> np.ndarray:
    return np.array(
        [[d["fx"], 0.0, d["cx"]], [0.0, d["fy"], d["cy"]], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )


def get_pardom_extrinsics_matrix(d) -> np.ndarray:
    rot_q = d.get("rotation", d.get("orientation"))
    rot_t = d.get("translation", d.get("position"))
    if "qw" in rot_q:
        q = (rot_q["qw"], rot_q["qx"], rot_q["qy"], rot_q["qz"])
    else:
        q = (rot_q["w"], rot_q["x"], rot_q["y"], rot_q["z"])
    ext = np.eye(4, dtype=np.float32)
    ext[0:3, 0:3] = quaternion_to_rotation_matrix(q)
    ext[0:3, 3] = [rot_t["x"], rot_t["y"], rot_t["z"]]
    return ext


def get_pardom_camera_matrices(calibration):
    """(geometry.py:95-131): sorted view names, pixel-space intrinsics."""
    view_names = []
    intr, extr = {}, {}
    for view_name, i_d, e_d in zip(
        calibration["names"], calibration["intrinsics"], calibration["extrinsics"]
    ):
        if "velodyne" in view_name.lower():
            continue
        intr[view_name] = get_pardom_intrinsics_matrix(i_d)
        extr[view_name] = get_pardom_extrinsics_matrix(e_d)
        view_names.append(view_name)
    view_names = sorted(view_names)
    all_intrinsics = np.stack([intr[v] for v in view_names])
    all_extrinsics = np.stack([extr[v] for v in view_names])
    return view_names, all_intrinsics, all_extrinsics


def cartesian_from_spherical(spherical, deg2rad: bool = False) -> np.ndarray:
    azimuth = spherical[..., 0]
    elevation = spherical[..., 1]
    radius = spherical[..., 2]
    if deg2rad:
        azimuth = np.deg2rad(azimuth)
        elevation = np.deg2rad(elevation)
    x = radius * np.cos(elevation) * np.cos(azimuth)
    y = radius * np.cos(elevation) * np.sin(azimuth)
    z = radius * np.sin(elevation)
    return np.stack([x, y, z], axis=-1)


def spherical_from_cartesian(cartesian, rad2deg: bool = False) -> np.ndarray:
    x = cartesian[..., 0]
    y = cartesian[..., 1]
    z = cartesian[..., 2]
    radius = np.linalg.norm(cartesian, ord=2, axis=-1)
    azimuth = np.arctan2(y, x)
    elevation = np.arctan2(z, np.linalg.norm(cartesian[..., 0:2], ord=2, axis=-1))
    if rad2deg:
        azimuth = np.rad2deg(azimuth)
        elevation = np.rad2deg(elevation)
    return np.stack([azimuth, elevation, radius], axis=-1)


def interpolate_spherical(cart_start, cart_end, alpha: float) -> np.ndarray:
    """(geometry.py:170-190): lerp in spherical space with azimuth wrap."""
    spher_start = spherical_from_cartesian(np.asarray(cart_start, dtype=np.float64))
    spher_end = spherical_from_cartesian(np.asarray(cart_end, dtype=np.float64))
    for i in (0, 1):
        if spher_end[i] - spher_start[i] > np.pi:
            spher_end[i] -= 2 * np.pi
        if spher_end[i] - spher_start[i] < -np.pi:
            spher_end[i] += 2 * np.pi
    spher_interp = spher_start * (1 - alpha) + spher_end * alpha
    return cartesian_from_spherical(spher_interp)


def extrinsics_from_look_at(camera_position, camera_look_at) -> np.ndarray:
    """(geometry.py:192-229): columns = right, down, forward."""
    camera_position = np.asarray(camera_position, dtype=np.float64)
    forward = np.asarray(camera_look_at, dtype=np.float64) - camera_position
    forward /= np.linalg.norm(forward)
    world_down = np.array([0, 0, -1], dtype=np.float64)
    right = np.cross(world_down, forward)
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    rt = np.eye(4)
    rt[0:3, 0:3] = np.stack([right, down, forward], axis=1)
    rt[0:3, 3] = camera_position
    return rt


def camera_to_world(xyz_camera, extrinsics):
    return xyz_camera @ extrinsics[0:3, 0:3].T + extrinsics[0:3, 3]


def world_to_camera(xyz_world, extrinsics):
    return (xyz_world - extrinsics[0:3, 3]) @ extrinsics[0:3, 0:3]


# ---------------------------------------------------------------------------
# Point-splat rendering (jax, jittable, f32)
# ---------------------------------------------------------------------------


def _spread_offsets(radius: int):
    """Neighbor-offset list of spreaded_index_add (geometry.py:370-380)."""
    left = radius // 2
    right = (radius + 1) // 2
    return [
        (dx, dy)
        for dx in range(-left, right + 1)
        for dy in range(-left, right + 1)
        if not (dx == 0 and dy == 0)
    ]


@functools.partial(
    jax.jit, static_argnames=("height", "width", "spread_radius", "mode")
)
def splat_points_to_image(
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    valid: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsics: jnp.ndarray,
    height: int,
    width: int,
    spread_radius: int = 1,
    mode: str = "kubric",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a point cloud into (H, W, 3) with a depth-exponential soft
    z-buffer (reference project_points_to_pixels, geometry.py:242-346).

    xyz: (N, 3) world points (pad with anything; mask via `valid`).
    rgb: (N, 3) colors in [0, 1].
    valid: (N,) bool.
    mode: "kubric" (strength 512) or "pardom" (sqrt depth, clamp 32,
          strength 256) — the reference picks the branch by depth magnitude
          (geometry.py:289-302); here it is static per dataset.

    Returns (img, weight_sum): img (H, W, 3) in [0, 1] with exact zeros where
    no point landed; weight_sum (H, W) of accumulated (shifted) weights,
    > 0 where any point contributed.
    """
    xyz = xyz.astype(jnp.float32)
    rgb = rgb.astype(jnp.float32)
    k = intrinsics.astype(jnp.float32)
    rt = extrinsics.astype(jnp.float32)

    xyz_cam = (xyz - rt[0:3, 3]) @ rt[0:3, 0:3]
    uvw = xyz_cam @ k.T
    depth = xyz_cam[:, 2]
    uv = uvw[:, 0:2] / jnp.maximum(jnp.abs(uvw[:, 2:3]), 1e-12) * jnp.sign(
        uvw[:, 2:3]
    )
    # int cast with the reference's +0.5 round-toward-zero semantics
    uv_int = (uv + 0.5).astype(jnp.int32)
    u, v = uv_int[:, 0], uv_int[:, 1]
    mask = (
        valid
        & (u >= 0) & (u < width)
        & (v >= 0) & (v < height)
        & (depth > 0.1)
    )

    if mode == "pardom":
        strength = 256.0
        depth_eff = jnp.clip(jnp.sqrt(jnp.maximum(depth, 0.0)), 0.0, 32.0)
    else:
        strength = 512.0
        depth_eff = depth

    dmax = jnp.max(jnp.where(mask, depth_eff, -jnp.inf))
    depth_norm = depth_eff / dmax * 2.0 - 1.0
    neg = -depth_norm * strength  # exponent; larger = closer

    flat_idx = v * width + u
    hw = height * width

    offsets = [(0, 0)] + _spread_offsets(spread_radius)
    factors = [1.0] + [0.02] * (len(offsets) - 1)

    all_idx = []
    all_neg = []
    all_factor = []
    all_maskf = []
    for (dx, dy), factor in zip(offsets, factors):
        ui = u + dx
        vi = v + dy
        m = mask & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
        idx = jnp.where(m, vi * width + ui, hw)  # dump invalid into a slot
        all_idx.append(idx)
        all_neg.append(neg)
        all_factor.append(jnp.full_like(neg, factor))
        all_maskf.append(m)

    idx_cat = jnp.concatenate(all_idx)
    neg_cat = jnp.concatenate(all_neg)
    fac_cat = jnp.concatenate(all_factor)
    mask_cat = jnp.concatenate(all_maskf)
    rgb_cat = jnp.concatenate([rgb] * len(offsets), axis=0)

    # Per-pixel max exponent (log-sum-exp shift). Invalid slot hw is dropped.
    neg_for_max = jnp.where(mask_cat, neg_cat, -jnp.inf)
    pix_max = jax.ops.segment_max(
        neg_for_max, idx_cat, num_segments=hw + 1, indices_are_sorted=False
    )
    pix_max_safe = jnp.where(jnp.isfinite(pix_max), pix_max, 0.0)

    w = jnp.exp(neg_cat - pix_max_safe[idx_cat]) * fac_cat
    w = jnp.where(mask_cat, w, 0.0)

    denom = jax.ops.segment_sum(w, idx_cat, num_segments=hw + 1)
    numer = jax.ops.segment_sum(w[:, None] * rgb_cat, idx_cat, num_segments=hw + 1)

    denom = denom[:hw].reshape(height, width)
    numer = numer[:hw].reshape(height, width, 3)
    img = jnp.where(denom[..., None] > 0.0, numer / jnp.maximum(denom[..., None], 1e-30), 0.0)
    img = jnp.clip(img, 0.0, 1.0)
    return img, denom


# ---------------------------------------------------------------------------
# Hole filling (reference blur_into_black, geometry.py:404-444)
# ---------------------------------------------------------------------------


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def _gaussian_blur(img: jnp.ndarray, kernel_size: int, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur of (H, W, C) with reflect padding (matching
    torchvision.transforms.functional.gaussian_blur). Depthwise lax convs."""
    k = _gaussian_kernel1d(kernel_size, sigma)
    pad = kernel_size // 2
    c = img.shape[-1]
    dn = jax.lax.conv_dimension_numbers(
        (1,) + img.shape, (kernel_size, 1, 1, c), ("NHWC", "HWIO", "NHWC")
    )

    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="reflect")[None]
    kv = jnp.tile(k.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kv, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )[0]

    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")[None]
    kh = jnp.tile(k.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn2 = jax.lax.conv_dimension_numbers(
        x.shape, (1, kernel_size, 1, c), ("NHWC", "HWIO", "NHWC")
    )
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn2, feature_group_count=c
    )[0]
    return x


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def blur_into_black(img: jnp.ndarray, kernel_size: int = 5,
                    sigma: float = 1.5) -> jnp.ndarray:
    """Leak valid content into zero (hole) pixels with mask-normalized gaussian
    blur, then a gentle 3x3 smoothing (geometry.py:404-424)."""
    black = (img.sum(axis=-1) == 0.0)[..., None]  # (H, W, 1)
    borrow = 1.0 - black.astype(jnp.float32)

    blur_img = _gaussian_blur(img, kernel_size, sigma)
    blur_mask = _gaussian_blur(borrow, kernel_size, sigma)
    leak = blur_img / jnp.clip(blur_mask, 1e-7, None)
    filled = jnp.where(black, leak, img)
    return _gaussian_blur(filled, 3, 0.6)


def render_point_cloud(
    xyz: np.ndarray,
    rgb: np.ndarray,
    intrinsics: np.ndarray,
    extrinsics: np.ndarray,
    height: int,
    width: int,
    spread_radius: int = 1,
    mode: str = "kubric",
    blur_kernel: int = 21,
    pad_to_multiple: int = 1 << 18,
) -> np.ndarray:
    """Host-friendly wrapper: splat + fill holes. Returns (H, W, 3) float32
    in [0, 1].

    Prefers the native C++/OpenMP kernel (gcd_tpu/native/splat.cpp — a
    streaming scatter, ~5x faster single-core than the XLA-CPU lowering and
    scaling with host cores); falls back to the jittable jax path (padded to
    bucketed sizes for stable jit shapes) when no compiler is available or
    GCD_NO_NATIVE_SPLAT=1."""
    from gcd_tpu import native

    if native.native_available():
        img = native.splat_points_native(
            xyz, rgb, intrinsics, extrinsics, height, width,
            spread_radius=spread_radius, mode=mode,
        )
        return native.blur_into_black_native(img, kernel_size=blur_kernel)

    n = xyz.shape[0]
    n_pad = ((n + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    xyz_p = np.zeros((n_pad, 3), dtype=np.float32)
    rgb_p = np.zeros((n_pad, 3), dtype=np.float32)
    xyz_p[:n] = xyz
    rgb_p[:n] = rgb
    valid = np.zeros((n_pad,), dtype=bool)
    valid[:n] = True

    import contextlib

    dev = _render_device()
    ctx = jax.default_device(dev) if dev is not None else contextlib.nullcontext()
    with _RENDER_LOCK, ctx:
        img, _ = splat_points_to_image(
            jnp.asarray(xyz_p), jnp.asarray(rgb_p), jnp.asarray(valid),
            jnp.asarray(intrinsics), jnp.asarray(extrinsics),
            height, width, spread_radius=spread_radius, mode=mode,
        )
        img = blur_into_black(img, kernel_size=blur_kernel,
                              sigma=blur_kernel / 4.0)
        return np.asarray(img)
