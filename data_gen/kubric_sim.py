"""Kubric-4D scene simulation + rendering backend.

Behavioral reference: data-gen/kubric_sim.py (MyKubricSimulatorRenderer :70):
wraps the Kubric + Blender(bpy) + PyBullet lifecycle in one process — scene
prep with an HDRI dome and GSO/KuBasic asset sources (:131-139), GPT-estimated
mass priors applied with a scaling law (:148-157, :404), static/dynamic object
insertion with velocity ranges (:429-553), exact camera placement (:289-403),
physics simulation (:620) and multi-layer rendering (:640).

This environment has no Blender/bpy or pybullet, so the heavy backends are
pluggable:
  * `KubricBackend`  — the real thing; raises a clear error if `bpy`/`kubric`
    are not importable (run inside the kubricdockerhub/kubruntu image, as the
    reference does).
  * `MockBackend`    — zero-filled layers with correct shapes/dtypes, the same
    strategy the vendored Kubric uses for its own tests
    (kubric/sunds/render_mock_utils.py:28-60); lets the full export pipeline
    (scene sampling, cameras, metadata, file layout) run and be tested
    anywhere.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from gcd_tpu.data import geometry

DEFAULT_RESOLUTION = (576, 384)  # (W, H) export_kub_mv.py:241
DEFAULT_FRAMES = 60
DEFAULT_FPS = 24


def load_mass_priors(fp: str) -> Dict[str, List[float]]:
    """`gpt_mass_v4.txt`: one `asset_id: m1, m2, ...` row per GSO asset
    (kubric_sim.py:148-157)."""
    priors: Dict[str, List[float]] = {}
    if not os.path.isfile(fp):
        return priors
    with open(fp) as f:
        for line in f:
            line = line.strip()
            if not line or ":" not in line:
                continue
            key, vals = line.split(":", 1)
            try:
                priors[key.strip()] = [
                    float(v) for v in vals.replace(",", " ").split()]
            except ValueError:
                continue
    return priors


def scaled_mass(mass_prior_kg: float, scale: float) -> float:
    """Mass scaling law: density preserved under object rescaling
    (kubric_sim.py:404 _fix_mass_knowledge)."""
    return mass_prior_kg * scale**3


def sample_camera_rig(radius: float = 15.0,
                      look_at=(0.0, 0.0, 1.0)) -> List[np.ndarray]:
    """The 16 static synchronized viewpoints: 4 at 45 deg elevation + 12 at
    5 deg, evenly spaced azimuths, radius 15, look-at [0,0,1]
    (export_kub_mv.py:202-225). Returns (V, 4, 4) extrinsics."""
    extrinsics = []
    for i in range(4):
        az = i * 90.0 + 45.0
        sph = np.array([np.deg2rad(az), np.deg2rad(45.0), radius])
        pos = geometry.cartesian_from_spherical(sph)
        pos[2] += look_at[2]
        extrinsics.append(geometry.extrinsics_from_look_at(pos, look_at))
    for i in range(12):
        az = i * 30.0
        sph = np.array([np.deg2rad(az), np.deg2rad(5.0), radius])
        pos = geometry.cartesian_from_spherical(sph)
        pos[2] += look_at[2]
        extrinsics.append(geometry.extrinsics_from_look_at(pos, look_at))
    return [e.astype(np.float32) for e in extrinsics]


class MockBackend:
    """Shape/dtype-correct zero renders (render_mock_utils.mock_render
    strategy) + ballistic 'physics'."""

    def __init__(self, resolution=DEFAULT_RESOLUTION):
        self.resolution = resolution

    def simulate(self, scene_spec: Dict, num_frames: int, fps: int) -> Dict:
        rng = np.random.default_rng(scene_spec.get("seed", 0))
        trajectories = {}
        for obj in scene_spec["objects"]:
            pos = np.asarray(obj["position"], dtype=np.float32)
            vel = np.asarray(obj.get("velocity", [0, 0, 0]), dtype=np.float32)
            traj = np.zeros((num_frames, 3), dtype=np.float32)
            p, v = pos.copy(), vel.copy()
            for t in range(num_frames):
                traj[t] = p
                v[2] -= 9.81 / fps
                p = p + v / fps
                if p[2] < 0:  # floor bounce with damping
                    p[2] = 0.0
                    v[2] = abs(v[2]) * 0.5
            trajectories[obj["asset_id"] + f"_{obj['index']}"] = traj
        return {"trajectories": trajectories}

    def render(self, scene_spec: Dict, extrinsics: np.ndarray,
               num_frames: int) -> Dict[str, np.ndarray]:
        w, h = self.resolution
        rng = np.random.default_rng(
            (scene_spec.get("seed", 0), int(abs(extrinsics).sum() * 100)))
        # Low-frequency colored noise + a plausible depth plane: enough
        # structure for the downstream converter/renderer round trip to be
        # meaningful, still trivially cheap.
        small = rng.integers(0, 255, (num_frames, h // 16, w // 16, 3),
                             dtype=np.uint8)
        rgb = np.repeat(np.repeat(small, 16, axis=1), 16, axis=2)[:, :h, :w]
        rgba = np.concatenate(
            [rgb, np.full((num_frames, h, w, 1), 255, dtype=np.uint8)], axis=-1)
        depth = np.full((num_frames, h, w), 14.0, dtype=np.float32)
        depth += rng.uniform(-1.0, 1.0, (num_frames, 1, 1)).astype(np.float32)
        return {
            "rgba": rgba,
            "depth": depth,
            "segmentation": np.zeros((num_frames, h, w, 1), dtype=np.uint32),
            "forward_flow": np.zeros((num_frames, h, w, 2), dtype=np.float32),
            "normal": np.zeros((num_frames, h, w, 3), dtype=np.float32),
            "object_coordinates": np.zeros((num_frames, h, w, 3),
                                           dtype=np.float32),
        }


class KubricBackend:
    """Real Blender/PyBullet path; requires the kubric docker environment."""

    def __init__(self, scratch_dir: str, resolution=DEFAULT_RESOLUTION):
        try:
            import bpy  # noqa: F401
            import kubric  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "The real Kubric backend needs Blender's `bpy` and the "
                "`kubric` package (run inside kubricdockerhub/kubruntu, as "
                "the reference does: README 'Dataset Generation'). Use "
                "MockBackend for pipeline testing without Blender."
            ) from e
        self.scratch_dir = scratch_dir
        self.resolution = resolution

    def simulate(self, scene_spec, num_frames, fps):  # pragma: no cover
        raise NotImplementedError(
            "bpy present but the full Kubric adapter is not wired in this "
            "round; see data-gen/kubric_sim.py in the reference for the "
            "Blender-side protocol.")

    def render(self, scene_spec, extrinsics, num_frames):  # pragma: no cover
        raise NotImplementedError


class KubricSimulatorRenderer:
    """Scene lifecycle orchestration (reference MyKubricSimulatorRenderer)."""

    def __init__(self, backend=None, mass_priors_fp: str = "",
                 resolution=DEFAULT_RESOLUTION, seed: int = 0):
        self.backend = backend or MockBackend(resolution)
        self.mass_priors = load_mass_priors(mass_priors_fp)
        self.resolution = resolution
        self.rng = np.random.default_rng(seed)
        self.scene_spec: Optional[Dict] = None

    def prepare_next_scene(self, seed: int, asset_ids: List[str],
                           num_static=(6, 16), num_dynamic=(1, 6)) -> Dict:
        """HDRI dome + object sampling (kubric_sim.py:206, 429-553)."""
        rng = np.random.default_rng(seed)
        n_static = int(rng.integers(num_static[0], num_static[1] + 1))
        n_dynamic = int(rng.integers(num_dynamic[0], num_dynamic[1] + 1))
        objects = []
        for i in range(n_static + n_dynamic):
            dynamic = i >= n_static
            asset_id = str(rng.choice(asset_ids))
            scale = float(rng.uniform(0.75, 3.0))
            mass_samples = self.mass_priors.get(asset_id, [1.0])
            mass = scaled_mass(float(rng.choice(mass_samples)), scale)
            obj = {
                "index": i,
                "asset_id": asset_id,
                "dynamic": dynamic,
                "scale": scale,
                "mass": mass,
                "position": [float(rng.uniform(-6, 6)),
                             float(rng.uniform(-6, 6)),
                             float(rng.uniform(0.1, 1.0) if not dynamic
                                   else rng.uniform(2.0, 6.0))],
            }
            if dynamic:
                # Throw toward the scene center (kubric_sim.py:509-538).
                target = np.array([rng.uniform(-3, 3), rng.uniform(-3, 3), 0.5])
                vel = target - np.asarray(obj["position"])
                vel = vel / np.linalg.norm(vel) * rng.uniform(2.0, 6.0)
                obj["velocity"] = [float(v) for v in vel]
            objects.append(obj)
        self.scene_spec = {"seed": seed, "objects": objects,
                           "background": "hdri_dome"}
        return self.scene_spec

    def simulate_frames(self, num_frames=DEFAULT_FRAMES, fps=DEFAULT_FPS):
        assert self.scene_spec is not None
        return self.backend.simulate(self.scene_spec, num_frames, fps)

    def render_frames(self, extrinsics: np.ndarray,
                      num_frames=DEFAULT_FRAMES) -> Dict[str, np.ndarray]:
        assert self.scene_spec is not None
        return self.backend.render(self.scene_spec, extrinsics, num_frames)

    def get_metadata(self, scene_idx: int, view_extrinsics,
                     intrinsics_normalized, num_frames=DEFAULT_FRAMES,
                     fps=DEFAULT_FPS) -> Dict:
        """Per-view metadata json matching what the converters/datasets read
        (scene.num_frames, camera.K/quaternions/positions)."""
        rt = np.asarray(view_extrinsics)
        # Rotation back to the stored convention: undo the Y/Z column flip.
        rot = rt[0:3, 0:3].copy()
        rot[:, 1] *= -1.0
        rot[:, 2] *= -1.0
        q = _rotation_matrix_to_quaternion(rot)
        return {
            "scene": {
                "num_frames": num_frames,
                "frame_rate": fps,
                "resolution": list(self.resolution),
                "scene_idx": scene_idx,
            },
            "camera": {
                "K": np.abs(np.asarray(intrinsics_normalized)).tolist(),
                "quaternions": [q.tolist()] * num_frames,
                "positions": [rt[0:3, 3].tolist()] * num_frames,
            },
            "objects": self.scene_spec["objects"] if self.scene_spec else [],
        }


def _rotation_matrix_to_quaternion(m: np.ndarray) -> np.ndarray:
    """(3,3) -> (w, x, y, z)."""
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                         (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q
