"""Import-contract test for the real KubricBackend (VERDICT round-1 #10).

Blender/bpy and the kubric package don't exist in this image, so the backend
is exercised against structured stand-ins injected via `_modules`. The stubs
assert the reference protocol (data-gen/kubric_sim.py:70-846): PyBullet
reused across scenes, Blender renderer rebuilt per scene, HDRI-textured dome,
spec-driven object insertion, camera keyframing, and segmentation-id
normalization after render.
"""

from unittest import mock

import numpy as np
import pytest

from data_gen.kubric_sim import (DEFAULT_FPS, KubricBackend,
                                 KubricSimulatorRenderer, sample_camera_rig)


class FakeAsset:
    def __init__(self, asset_id, name, **kwargs):
        self.asset_id = asset_id
        self.name = name
        self.metadata = {}
        self.kwargs = kwargs
        self.position = np.zeros(3)
        self.velocity = np.zeros(3)
        self.scale = 1.0
        self.mass = 1.0
        self.friction = None
        self.restitution = None
        self.keyframes = {}
        self.filename = f"/assets/{asset_id}.blend"
        # blender-side twin appears once the renderer links the asset;
        # auto-vivify one per renderer like kubric does
        import collections

        self.linked_objects = collections.defaultdict(mock.MagicMock)


class FakeSource:
    def __init__(self, ids):
        self.all_asset_ids = list(ids)
        self.created = []

    @classmethod
    def from_manifest(cls, manifest):
        if "GSO" in manifest:
            return cls([f"gso_{i}" for i in range(8)])
        if "HDRI" in manifest:
            return cls(["sky_a", "sky_b"])
        return cls(["dome"])

    def create(self, asset_id, name, **kwargs):
        a = FakeAsset(asset_id, name, **kwargs)
        self.created.append(a)
        return a


class FakeScene:
    instances = []

    def __init__(self, frame_start, frame_end, frame_rate, resolution):
        self.frame_start = frame_start
        self.frame_end = frame_end
        self.frame_rate = frame_rate
        self.resolution = resolution
        self.assets = []
        self.metadata = {}
        self.camera = None
        FakeScene.instances.append(self)

    def __iadd__(self, asset):
        self.assets.append(asset)
        return self


class FakeCamera:
    def __init__(self, focal_length, sensor_width):
        self.focal_length = focal_length
        self.sensor_width = sensor_width
        self.position = np.zeros(3)
        self.quaternion = np.array([1.0, 0, 0, 0])
        self.keyframed = []

    def keyframe_insert(self, attr, frame):
        self.keyframed.append((attr, frame))


class FakePyBullet:
    instances = []

    def __init__(self, scene, scratch_dir):
        self.scene = scene
        self.scratch_dir = scratch_dir
        self.run_calls = []
        FakePyBullet.instances.append(self)

    def check_overlap(self, obj):
        return False

    def run(self, frame_start, frame_end):
        self.run_calls.append((frame_start, frame_end))
        # keyframe positions for every dynamic asset
        for a in self.scene.assets:
            if a.metadata.get("is_dynamic"):
                a.keyframes["position"] = {
                    t: np.asarray(a.position) + [0, 0, -0.1 * t]
                    for t in range(frame_end + 1)}
        return {"anim": True}, [{"collision": 0}]


class FakeBlender:
    instances = []

    def __init__(self, scene, scratch_dir, **kwargs):
        self.scene = scene
        self.kwargs = kwargs
        self.ambient = None
        self.render_calls = []
        # dome texturing path: linked_objects[renderer] -> blender object
        FakeBlender.instances.append(self)

    def _set_ambient_light_hdri(self, filename):
        self.ambient = filename

    def render(self, frames, return_layers):
        self.render_calls.append((list(frames), list(return_layers)))
        t = len(frames)
        h, w = self.scene.resolution[1], self.scene.resolution[0]
        out = {}
        for layer in return_layers:
            if layer == "rgba":
                out[layer] = np.zeros((t, h, w, 4), np.uint8)
            elif layer == "depth":
                out[layer] = np.full((t, h, w, 1), 7.0, np.float32)
            elif layer == "segmentation":
                out[layer] = np.ones((t, h, w, 1), np.uint32) * 9
            elif layer == "forward_flow":
                out[layer] = np.zeros((t, h, w, 2), np.float32)
            else:
                out[layer] = np.zeros((t, h, w, 3), np.float32)
        return out


def make_fake_kb():
    kb = mock.MagicMock(name="kubric")
    kb.AssetSource = FakeSource
    kb.Scene = FakeScene
    kb.PerspectiveCamera = FakeCamera
    kb.simulator.PyBullet = FakePyBullet
    kb.renderer.Blender = FakeBlender
    kb.adjust_segmentation_idxs = mock.MagicMock(
        side_effect=lambda seg, assets, fg: np.clip(seg, 0, len(fg)))
    kb.resample_while = mock.MagicMock()
    return kb


@pytest.fixture
def backend(tmp_path):
    FakeScene.instances = []
    FakePyBullet.instances = []
    FakeBlender.instances = []
    bpy = mock.MagicMock(name="bpy")
    kb = make_fake_kb()
    be = KubricBackend(str(tmp_path), resolution=(64, 48),
                       _modules=(bpy, kb))
    # dome gets its blender-side object lazily after renderer exists
    return be


def _spec(seed=3):
    orch = KubricSimulatorRenderer(backend=None, seed=seed)
    return orch.prepare_next_scene(seed, [f"gso_{i}" for i in range(8)])


def test_backend_requires_bpy_without_injection(tmp_path):
    with pytest.raises(ImportError, match="kubricdockerhub"):
        KubricBackend(str(tmp_path))


def test_scene_build_and_simulate(backend):
    spec = _spec()
    out = backend.simulate(spec, num_frames=6, fps=DEFAULT_FPS)

    # scene graph: dome + every spec object, in order
    scene = FakeScene.instances[-1]
    assert scene.frame_start == 0 and scene.frame_end == 5
    assert scene.resolution == (64, 48)
    assert scene.assets[0].asset_id == "dome"
    assert len(scene.assets) == 1 + len(spec["objects"])
    for spec_obj, asset in zip(spec["objects"], scene.assets[1:]):
        assert asset.asset_id == spec_obj["asset_id"]
        assert asset.mass == spec_obj["mass"]
        assert asset.scale == spec_obj["scale"]
        assert asset.metadata["is_dynamic"] == spec_obj["dynamic"]
        if spec_obj["dynamic"]:
            np.testing.assert_allclose(asset.velocity, spec_obj["velocity"])
            assert 0.4 <= asset.friction <= 0.5
        else:
            assert asset.friction == 1.0

    # HDRI dome texture + ambient light synced to the same file
    blender = FakeBlender.instances[-1]
    assert blender.ambient is not None and blender.ambient.endswith(".blend")
    assert scene.metadata["background"] in ("sky_a", "sky_b")

    # physics ran over the full frame range, trajectories per object
    sim = FakePyBullet.instances[-1]
    assert sim.run_calls == [(0, 5)]
    key0 = f"{spec['objects'][0]['asset_id']}_0"
    assert key0 in out["trajectories"]
    dyn = [o for o in spec["objects"] if o["dynamic"]][0]
    traj = out["trajectories"][f"{dyn['asset_id']}_{dyn['index']}"]
    assert traj.shape == (6, 3)
    assert traj[1, 2] < traj[0, 2]  # falling


def test_simulator_reused_renderer_rebuilt(backend):
    backend.simulate(_spec(1), num_frames=4, fps=DEFAULT_FPS)
    backend.simulate(_spec(2), num_frames=4, fps=DEFAULT_FPS)
    assert len(FakePyBullet.instances) == 1  # reused (kubric_sim.py:234)
    assert len(FakeBlender.instances) == 2  # fresh per scene (:242)
    assert FakePyBullet.instances[0].scene is FakeScene.instances[-1]


def test_render_contract(backend):
    spec = _spec()
    rig = sample_camera_rig()
    out = backend.render(spec, rig[0], num_frames=5)

    blender = FakeBlender.instances[-1]
    frames, layers = blender.render_calls[-1]
    assert frames == [0, 1, 2, 3, 4]
    assert "segmentation" in layers and "depth" in layers

    # camera: one static pose keyframed from -1 to num_frames+1 inclusive
    cam = FakeScene.instances[-1].camera
    np.testing.assert_allclose(cam.position, rig[0][0:3, 3])
    assert len(cam.keyframed) == 2 * (5 + 3)

    # segmentation ids normalized to [0, len(foreground_assets)]
    assert backend.kb.adjust_segmentation_idxs.called
    assert out["segmentation"].max() <= len(spec["objects"])
    # depth squeezed to (T, H, W) like MockBackend
    assert out["depth"].shape == (5, 48, 64)

    # render on the SAME spec must not rebuild the scene
    n_scenes = len(FakeScene.instances)
    backend.render(spec, rig[1], num_frames=5)
    assert len(FakeScene.instances) == n_scenes


def test_get_metadata_passes_rendered_segmentation_to_bboxes(backend):
    """kubric's compute_bboxes walks the per-frame segmentation array — it
    must receive the segmentation retained from the last render(), never
    None (which crashes the real API)."""
    spec = _spec()
    out = backend.render(spec, sample_camera_rig()[0], num_frames=3)
    backend.get_metadata()
    args, _ = backend.kb.post_processing.compute_bboxes.call_args
    assert args[0] is out["segmentation"]

    # before any render: skip bbox computation rather than crash
    backend.kb.post_processing.compute_bboxes.reset_mock()
    backend._last_segmentation = None
    backend.get_metadata()
    assert not backend.kb.post_processing.compute_bboxes.called


def test_orchestrator_with_real_backend_contract(backend):
    """KubricSimulatorRenderer drives the injected backend end-to-end."""
    orch = KubricSimulatorRenderer(backend=backend, seed=0)
    orch.prepare_next_scene(0, [f"gso_{i}" for i in range(8)])
    sim = orch.simulate_frames(num_frames=4, fps=DEFAULT_FPS)
    assert sim["trajectories"]
    layers = orch.render_frames(sample_camera_rig()[0], num_frames=4)
    assert layers["rgba"].shape == (4, 48, 64, 4)
