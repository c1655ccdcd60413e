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
    """Real Blender/PyBullet path (reference MyKubricSimulatorRenderer,
    kubric_sim.py:70-846), exposed through the same backend contract as
    MockBackend: `simulate(scene_spec, num_frames, fps)` then
    `render(scene_spec, extrinsics, num_frames)` per view.

    Requires Blender's `bpy` and the `kubric` package — run inside the
    kubricdockerhub/kubruntu image (README 'Dataset Generation'); this
    environment has neither, so construction raises a clear ImportError.
    The Blender-side protocol is import-contract-tested by injecting stub
    modules via `_modules` (tests/test_kubric_backend.py).

    Key behaviors carried over from the reference:
      * bpy/kubric are imported INSIDE __init__ and kept on self — importing
        bpy outside the using thread crashes Blender (kubric_sim.py:85-96);
      * one PyBullet simulator is reused for the process lifetime (PyBullet
        errors on re-init, :234-240) while the Blender renderer is rebuilt
        per scene (:242-246);
      * HDRI dome: paint the kubasic 'dome' asset with the sampled HDRI and
        sync ambient light (:258-280);
      * object insertion applies the mass scaling law and resamples poses
        until no overlap (:429-553).
    """

    def __init__(self, scratch_dir: str, resolution=DEFAULT_RESOLUTION,
                 frame_rate: int = DEFAULT_FPS, motion_blur: bool = True,
                 render_samples_per_pixel: int = 32,
                 render_use_gpu: bool = False, render_cpu_threads: int = -1,
                 focal_length: float = 35.0, _modules=None):
        if _modules is not None:
            self.bpy, self.kb = _modules
        else:  # pragma: no cover - needs the kubric docker image
            try:
                import bpy
                import kubric as kb
                import kubric.renderer  # noqa: F401
                import kubric.simulator  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "The real Kubric backend needs Blender's `bpy` and the "
                    "`kubric` package (run inside kubricdockerhub/kubruntu, "
                    "as the reference does: README 'Dataset Generation'). "
                    "Use MockBackend for pipeline testing without Blender."
                ) from e
            self.bpy, self.kb = bpy, kb

        os.makedirs(scratch_dir, exist_ok=True)
        self.scratch_dir = scratch_dir
        self.resolution = resolution
        self.frame_rate = frame_rate
        self.motion_blur = motion_blur
        self.render_samples_per_pixel = render_samples_per_pixel
        self.render_cpu_threads = render_cpu_threads
        self.focal_length = focal_length
        os.environ["KUBRIC_USE_GPU"] = "1" if render_use_gpu else "0"

        # Asset sources; same manifests as MOVi-D/E/F (kubric_sim.py:131-136).
        self.gso_source = self.kb.AssetSource.from_manifest(
            "gs://kubric-public/assets/GSO/GSO.json")
        self.hdri_source = self.kb.AssetSource.from_manifest(
            "gs://kubric-public/assets/HDRI_haven/HDRI_haven.json")
        self.kubasic_source = self.kb.AssetSource.from_manifest(
            "gs://kubric-public/assets/KuBasic/KuBasic.json")

        self.scene = None
        self.simulator = None
        self.renderer = None
        self.dome = None
        self.foreground_assets = []
        self._prepared_key = None
        self._last_collisions = None

    # -- scene construction ------------------------------------------------

    def _ensure_scene(self, scene_spec: Dict, num_frames: int) -> None:
        key = (id(scene_spec), scene_spec.get("seed"), num_frames)
        if self._prepared_key == key:
            return
        self._prepared_key = key
        rng = np.random.RandomState(scene_spec.get("seed", 0))

        w, h = self.resolution
        self.scene = self.kb.Scene(
            frame_start=0, frame_end=num_frames - 1,
            frame_rate=self.frame_rate, resolution=(w, h))

        # PyBullet reuse / Blender refresh (kubric_sim.py:234-246).
        if self.simulator is None:
            self.simulator = self.kb.simulator.PyBullet(
                self.scene, scratch_dir=self.scratch_dir)
        else:
            self.simulator.scene = self.scene
            self.simulator.scratch_dir = self.scratch_dir
        blur = rng.uniform(0.4, 0.8) if self.motion_blur else 0.0
        self.renderer = self.kb.renderer.Blender(
            self.scene, scratch_dir=self.scratch_dir,
            adaptive_sampling=False, use_denoising=True,
            samples_per_pixel=self.render_samples_per_pixel,
            motion_blur=blur)
        if self.render_cpu_threads >= 1:
            self.bpy.context.scene.render.threads_mode = "FIXED"
            self.bpy.context.scene.render.threads = self.render_cpu_threads

        # HDRI background dome (kubric_sim.py:258-280).
        hdri_id = scene_spec.get("background_hdri") or rng.choice(
            self.hdri_source.all_asset_ids)
        background_hdri = self.hdri_source.create(asset_id=hdri_id,
                                                  name="bg_hdri")
        self.scene.metadata["background"] = hdri_id
        self.dome = self.kubasic_source.create(
            asset_id="dome", name="dome", friction=1.0, restitution=0.0,
            static=True, background=True)
        self.scene += self.dome
        dome_blender = self.dome.linked_objects[self.renderer]
        tex = dome_blender.data.materials[0].node_tree.nodes["Image Texture"]
        tex.image = self.bpy.data.images.load(background_hdri.filename)
        self.renderer._set_ambient_light_hdri(background_hdri.filename)

        # Foreground objects from the sampled spec (kubric_sim.py:429-553).
        self.foreground_assets = []
        for spec in scene_spec["objects"]:
            obj = self.gso_source.create(
                asset_id=spec["asset_id"],
                name=("dynamic" if spec["dynamic"] else "static")
                + f"_{spec['index']:03d}")
            obj.scale = spec["scale"]
            obj.mass = spec["mass"]
            obj.metadata["object_kind"] = spec.get("kind", "any")
            obj.metadata["is_dynamic"] = bool(spec["dynamic"])
            self.scene += obj
            obj.position = np.asarray(spec["position"], dtype=np.float64)
            if self.simulator.check_overlap(obj):
                # Overlapping start pose: resample nearby like the reference's
                # move_until_no_overlap (:838-846), but keep the sampled
                # position as the spawn-region center for reproducibility.
                region = (tuple(np.asarray(spec["position"]) - 1.5),
                          tuple(np.asarray(spec["position"]) + 1.5))
                self.kb.resample_while(
                    obj,
                    samplers=[self.kb.rotation_sampler(
                        axis="Z" if spec.get("kind") in
                        ("container", "carrier", "box") else None),
                        self.kb.position_sampler(region)],
                    condition=self.simulator.check_overlap,
                    max_trials=100, rng=rng)
            if spec["dynamic"]:
                obj.velocity = np.asarray(spec.get("velocity", (0, 0, 0)),
                                          dtype=np.float64)
                obj.friction = rng.uniform(0.4, 0.5)
                obj.restitution = rng.uniform(0.6, 0.7)
            else:
                obj.friction = 1.0
                obj.restitution = 0.0
            self.foreground_assets.append(obj)
        self.dome.friction = rng.uniform(0.3, 0.4)
        self.dome.restitution = rng.uniform(0.6, 0.7)

    def _setup_camera_from_extrinsics(self, rt: np.ndarray,
                                      num_frames: int) -> None:
        """Static synchronized viewpoint: one pose keyframed over all frames
        (export_kub_mv renders each of the 16 rig views with a fixed camera;
        reference setup_camera_exact, kubric_sim.py:365-402)."""
        rt = np.asarray(rt, dtype=np.float64)
        self.scene.camera = self.kb.PerspectiveCamera(
            focal_length=self.focal_length, sensor_width=32.0)
        rot = rt[0:3, 0:3].copy()
        # Stored convention -> Blender camera frame (see get_metadata).
        rot[:, 1] *= -1.0
        rot[:, 2] *= -1.0
        quat = _rotation_matrix_to_quaternion(rot)
        for frame in range(-1, num_frames + 2):
            self.scene.camera.position = rt[0:3, 3]
            self.scene.camera.quaternion = quat
            self.scene.camera.keyframe_insert("position", frame)
            self.scene.camera.keyframe_insert("quaternion", frame)

    # -- backend contract --------------------------------------------------

    def simulate(self, scene_spec: Dict, num_frames: int, fps: int) -> Dict:
        assert fps == self.frame_rate, (fps, self.frame_rate)
        self._ensure_scene(scene_spec, num_frames)
        animations, collisions = self.simulator.run(0, num_frames - 1)
        self._last_collisions = collisions
        trajectories = {}
        for spec, obj in zip(scene_spec["objects"], self.foreground_assets):
            pos = getattr(obj, "keyframes", {}).get("position")
            if pos is not None:
                traj = np.asarray([pos[t] for t in sorted(pos)],
                                  dtype=np.float32)
            else:
                traj = np.tile(np.asarray(obj.position, np.float32),
                               (num_frames, 1))
            trajectories[f"{spec['asset_id']}_{spec['index']}"] = traj
        return {"trajectories": trajectories, "animations": animations,
                "collisions": collisions}

    def render(self, scene_spec: Dict, extrinsics: np.ndarray,
               num_frames: int,
               return_layers=("rgba", "forward_flow", "depth", "normal",
                              "object_coordinates", "segmentation"),
               ) -> Dict[str, np.ndarray]:
        self._ensure_scene(scene_spec, num_frames)
        self._setup_camera_from_extrinsics(extrinsics, num_frames)
        data_stack = self.renderer.render(
            frames=list(range(num_frames)), return_layers=list(return_layers))
        # Visibility + instance-id normalization (kubric_sim.py:669-690):
        # segmentation value k+1 points at foreground_assets[k], 0 is dome.
        self.kb.compute_visibility(data_stack["segmentation"],
                                   self.scene.assets)
        data_stack["segmentation"] = self.kb.adjust_segmentation_idxs(
            data_stack["segmentation"], self.scene.assets,
            self.foreground_assets)
        # Retained for get_metadata: kubric's compute_bboxes walks the
        # per-frame segmentation array (kubric/post_processing.py).
        self._last_segmentation = data_stack["segmentation"]
        if "depth" in data_stack:
            d = np.asarray(data_stack["depth"])
            if d.ndim == 4 and d.shape[-1] == 1:
                data_stack["depth"] = d[..., 0]
        return data_stack

    def get_metadata(self) -> Dict:
        """Scene/camera/instance metadata via kubric's introspection helpers
        (kubric_sim.py:756-782). Bounding boxes require the segmentation from
        the last render() — kubric's compute_bboxes iterates it per frame."""
        if getattr(self, "_last_segmentation", None) is not None:
            self.kb.post_processing.compute_bboxes(
                self._last_segmentation, self.foreground_assets)
        md = {
            "scene": self.kb.get_scene_metadata(self.scene),
            "camera": self.kb.get_camera_info(self.scene.camera),
            "instances": self.kb.get_instance_info(self.scene,
                                                   self.foreground_assets),
        }
        if self._last_collisions is not None:
            md["collisions"] = self.kb.process_collisions(
                self._last_collisions, self.scene,
                assets_subset=self.foreground_assets)
        return md


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
