"""Shared evaluation/inference utilities.

Behavioral reference: gcd-model/scripts/eval_utils.py — model-bundle loading
with inference config surgery (:35-92), train-config introspection (:95-143),
batch construction for arbitrary videos with spherical trajectories +
motion-bucket sync (:191-263), input path resolution (:337-413), media writing
(:510-566), latent PCA visualization (:482), text overlays (:450).
"""

from __future__ import annotations

import dataclasses
import glob
import os
import pathlib
import sys
from typing import Dict, List, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcd_tpu.data import common
from gcd_tpu.ops.dispatch import kernel_flags, program_flag_overrides
from gcd_tpu.utils.config import (
    load_config, set_by_path, get_by_path, instantiate_from_config,
)

MODEL_NAME_SHORTENER = {
    "kubric": "kb", "pardom": "pd", "gradual": "gr", "direct": "di",
    "semantic": "sem", "max": "m",
}


@dataclasses.dataclass
class ModelBundle:
    engine: object
    params: Dict
    train_config: Optional[Dict]
    test_config: Dict
    model_name: str
    # Camera/trajectory metadata pulled from the train config
    # (eval_utils.py:95-143):
    delta_azimuth_range: List[float]
    delta_elevation_range: List[float]
    delta_radius_range: List[float]
    trajectory: str
    move_time: int
    camera_control: str
    motion_bucket_range: List[int]


def _find_train_config(model_path: str) -> Optional[str]:
    """(eval_utils.py:63-75): sibling yaml, or the run's configs dir."""
    cand = model_path.replace(".ckpt", ".yaml").replace(".safetensors", ".yaml")
    if os.path.exists(cand) and cand != model_path:
        return cand
    p = pathlib.Path(model_path)
    d = p.parent
    if d.name == "checkpoints":
        d = d.parent
    hits = sorted(glob.glob(str(d) + "/*config*/*.yaml"))
    return hits[-1] if hits else None


def shorten_model_name(model_path: str) -> str:
    """(eval_utils.py:77-88)."""
    if "/checkpoints" in model_path:
        return model_path.split("/checkpoints")[0].rsplit("_", 1)[-1]
    name = os.path.basename(model_path).split(".")[0]
    for k, v in MODEL_NAME_SHORTENER.items():
        name = name.replace(k, v)
    return name


def load_model_bundle(config_path: str, model_path: str, support_ema: bool = False,
                      num_steps: int = 25, num_frames: int = 14,
                      max_scale: float = 1.5, min_scale: float = 1.0,
                      img_hw=(256, 384), compute_dtype: str = "bfloat16",
                      guidance_interval=None,
                      verbose: bool = False) -> ModelBundle:
    """Build the engine from an inference config with the reference's config
    surgery (eval_utils.py:43-58), then load weights (torch checkpoint or
    orbax run directory). compute_dtype=bfloat16 mirrors the reference's
    autocast-on evaluation default (scripts/test.py:70)."""
    import jax

    test_config = load_config(config_path)
    set_by_path(test_config, "model.params.ckpt_path", model_path)
    if "compute_dtype" not in (test_config["model"].get("params") or {}):
        set_by_path(test_config, "model.params.compute_dtype", compute_dtype)
    set_by_path(test_config, "model.params.use_ema", bool(support_ema))
    set_by_path(test_config, "model.params.ckpt_has_ema", bool(support_ema))
    set_by_path(test_config, "model.params.sampler_config.params.num_steps",
                int(num_steps))
    gp = "model.params.sampler_config.params.guider_config.params"
    set_by_path(test_config, gp + ".num_frames", int(num_frames))
    set_by_path(test_config, gp + ".max_scale", float(max_scale))
    set_by_path(test_config, gp + ".min_scale", float(min_scale))
    if guidance_interval is not None:
        # opt-in speed mode (diffusion/sampling.py BaseDiffusionSampler)
        set_by_path(test_config,
                    "model.params.sampler_config.params.guidance_interval",
                    [float(v) for v in guidance_interval])

    engine = instantiate_from_config(test_config["model"])

    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k: engine.init_params(k, img_hw=img_hw, t=num_frames)
    )(key)

    if model_path and os.path.exists(model_path):
        if os.path.isdir(model_path) or "step_" in os.path.basename(model_path):
            from gcd_tpu.io.checkpoint import restore_checkpoint, latest_step

            ckpt_dir = model_path
            step = None
            if os.path.basename(model_path).startswith("step_"):
                ckpt_dir = os.path.dirname(model_path)
                step = int(os.path.basename(model_path).split("_")[1])
            restored = restore_checkpoint(ckpt_dir, step)
            params = restored.get("params", restored)
        else:
            params = engine.load_torch_checkpoint(model_path, params,
                                                  verbose=verbose)
            import jax.numpy as jnp

            params = jax.tree_util.tree_map(jnp.asarray, params)
    elif verbose:
        print(f"Warning: model path {model_path!r} not found; "
              f"using random-init weights")

    train_config_fp = _find_train_config(model_path) if model_path else None
    train_config = load_config(train_config_fp) if train_config_fp else None
    if train_config is None and "data" in test_config:
        # The supplied config carries its own data section (train/smoke
        # configs double as eval configs when no run dir exists).
        train_config = test_config

    meta = dict(
        delta_azimuth_range=[0.0, 0.0],
        delta_elevation_range=[0.0, 0.0],
        delta_radius_range=[0.0, 0.0],
        trajectory="interpol_linear",
        move_time=0,
        camera_control="none",
        motion_bucket_range=[127, 127],
    )
    if train_config is not None:
        dp = get_by_path(train_config, "data.params", {}) or {}
        if "azimuth_range" in dp:
            meta["delta_azimuth_range"] = list(dp["delta_azimuth_range"])
        if "elevation_range" in dp:
            meta["delta_elevation_range"] = list(dp["delta_elevation_range"])
        if "radius_range" in dp:
            meta["delta_radius_range"] = list(dp["delta_radius_range"])
        for k in ("trajectory", "move_time", "camera_control"):
            if k in dp:
                meta[k] = dp[k]
        if "motion_bucket_range" in dp:
            mbr = dp["motion_bucket_range"]
            meta["motion_bucket_range"] = (
                list(map(int, mbr.split(","))) if isinstance(mbr, str)
                else list(mbr))
    if meta["camera_control"] == "none":
        # No train config (random-init / standalone checkpoint): infer the
        # control mode from the conditioner's embedder input keys so
        # construct_batch still produces every key the model consumes.
        embs = get_by_path(
            test_config, "model.params.conditioner_config.params.emb_models",
            []) or []
        keys = {e.get("input_key") for e in embs}
        if "scaled_relative_angles" in keys:
            meta["camera_control"] = "spherical"
        elif "scaled_relative_pose" in keys:
            meta["camera_control"] = "relative_pose"

    return ModelBundle(
        engine=engine, params=params, train_config=train_config,
        test_config=test_config,
        model_name=shorten_model_name(model_path or "random"),
        **meta,
    )


def construct_batch(input_rgb01: np.ndarray, azimuth_deg: float,
                    elevation_deg: float, radius_m: float, input_frames: int,
                    frame_rate: int, motion_bucket: int, cond_aug: float,
                    force_custom_mbid: bool, bundle: ModelBundle,
                    rng: Optional[np.random.Generator] = None) -> Dict:
    """Batch dict for arbitrary videos (eval_utils.py:191-263).
    input_rgb01: (T, H, W, 3) float in [0, 1]."""
    rng = rng or np.random.default_rng(0)
    tc = input_rgb01.shape[0]
    rgb = input_rgb01.astype(np.float32) * 2.0 - 1.0
    if input_frames < tc:
        rgb[input_frames:] = rgb[input_frames - 1:input_frames]

    batch = {
        "motion_bucket_id": np.full((tc,), motion_bucket, dtype=np.int32),
        "fps_id": np.full((tc,), frame_rate, dtype=np.int32),
        "cond_aug": np.full((tc,), cond_aug, dtype=np.float32),
        "cond_frames_without_noise": rgb,
        "cond_frames": rgb + rng.standard_normal(rgb.shape).astype(np.float32)
        * cond_aug,
        "jpg": np.zeros_like(rgb),
        "image_only_indicator": np.zeros((1, tc), dtype=np.float32),
        "num_video_frames": tc,
    }

    spherical_start = np.zeros(3, dtype=np.float32)
    spherical_end = np.array([azimuth_deg, elevation_deg, radius_m],
                             dtype=np.float32)
    if bundle.camera_control == "spherical":
        assert np.isfinite(spherical_end).all()
        s_src, s_dst = common.construct_trajectory(
            spherical_start, spherical_end, bundle.trajectory, tc,
            bundle.move_time)
        angles = s_dst - s_src
        angles[:, 0] *= np.pi / 180.0
        angles[:, 1] *= np.pi / 180.0
        batch["scaled_relative_angles"] = angles.astype(np.float32)
    elif bundle.camera_control == "relative_pose":
        batch["scaled_relative_pose"] = np.zeros((tc, 3, 4), dtype=np.float32)

    # Motion-bucket sync (eval_utils.py:252-263).
    mbr = bundle.motion_bucket_range
    motion_range = mbr[1] - mbr[0]
    if (bundle.camera_control != "none" and not force_custom_mbid
            and motion_range > 0):
        my_motion = np.linalg.norm(spherical_end[0:2] - spherical_start[0:2])
        max_motion = np.linalg.norm([
            max(*bundle.delta_azimuth_range),
            max(*bundle.delta_elevation_range)])
        motion_amount = my_motion / max_motion if max_motion > 0 else 0.0
        motion_value = int(round(mbr[0] + motion_range * motion_amount))
        batch["motion_bucket_id"] = np.full((tc,), motion_value, dtype=np.int32)
    return batch


# ---------------------------------------------------------------------------
# Inputs (eval_utils.py:337-449)
# ---------------------------------------------------------------------------

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".webm", ".gif", ".mkv")


def resolve_input_paths(spec: str) -> List[str]:
    """A file, a directory, a glob, or a .txt list of paths."""
    if spec.endswith(".txt"):
        base = os.path.dirname(os.path.abspath(spec))
        with open(spec) as f:
            lines = [ln.strip() for ln in f if ln.strip()
                     and not ln.startswith("#")]
        return [ln if os.path.isabs(ln) else os.path.join(base, ln)
                for ln in lines]
    if os.path.isdir(spec):
        out = []
        for ext in IMAGE_EXTS + VIDEO_EXTS:
            out += glob.glob(os.path.join(spec, f"*{ext}"))
        return sorted(out)
    if any(ch in spec for ch in "*?["):
        return sorted(glob.glob(spec))
    return [spec]


def load_image_or_video(fp: str, num_frames: int, frame_offset: int = 0,
                        frame_stride: int = 1, center_crop: bool = True,
                        frame_width: int = 384,
                        frame_height: int = 256) -> np.ndarray:
    """(T, H, W, 3) float32 in [0, 1] (eval_utils.py:435-449): images are
    repeated to T frames; videos are subsampled clip_frames."""
    ext = os.path.splitext(fp)[1].lower()
    if ext in IMAGE_EXTS:
        img = common.load_image(fp)
        frame = (common.process_image(
            img, center_crop, frame_width, frame_height) + 1.0) / 2.0
        return np.tile(frame[None], (num_frames, 1, 1, 1))
    video = common.load_video_mp4(fp)
    idx = np.arange(num_frames) * frame_stride + frame_offset
    idx = np.clip(idx, 0, len(video) - 1)
    frames = [
        (common.process_image(video[i], center_crop, frame_width,
                              frame_height) + 1.0) / 2.0
        for i in idx
    ]
    return np.stack(frames)


# ---------------------------------------------------------------------------
# 3D camera-pose visualization (eval_utils.py:679-917)
# ---------------------------------------------------------------------------


def calc_cam_cone_pts_3d(polar_deg: float, azimuth_deg: float,
                         radius_m: float, fov_deg: float) -> np.ndarray:
    """(5, 3) frustum points (apex + 4 unit-offset corners) of a camera at
    spherical (polar, azimuth, radius) looking at the origin
    (eval_utils.py:840-917)."""
    polar = -np.deg2rad(polar_deg)  # sign flip as in the reference
    azim = np.deg2rad(azimuth_deg)
    half = np.tan(np.deg2rad(fov_deg) / 2.0)

    cam = radius_m * np.array([np.cos(azim) * np.cos(polar),
                               np.sin(azim) * np.cos(polar),
                               np.sin(polar)])
    rot = np.array([
        [np.cos(azim) * np.cos(polar), -np.sin(azim),
         -np.cos(azim) * np.sin(polar)],
        [np.sin(azim) * np.cos(polar), np.cos(azim),
         -np.sin(azim) * np.sin(polar)],
        [np.sin(polar), 0.0, np.cos(polar)],
    ])
    corners_cam = np.array([[-1.0, half, half], [-1.0, -half, half],
                            [-1.0, -half, -half], [-1.0, half, -half]])
    corners = corners_cam @ rot.T
    corners /= np.linalg.norm(corners, axis=-1, keepdims=True)
    return np.concatenate([cam[None], cam[None] + corners], axis=0)


class CameraVisualizer:
    """Interactive 3D camera-frustum figure for the demo app
    (eval_utils.py:679-838): the conditioning image as a plane at the origin
    plus green/blue wireframe cones for the input and target cameras.

    Figure content is computed backend-free in `build_traces()` (plain numpy
    dict, unit-testable); `update_figure()` renders it with plotly when
    available and otherwise returns the trace dict as-is so the CLI fallback
    can still log/serialize it.
    """

    SCENE_BOUNDS = 3.5
    BASE_RADIUS = 2.5
    ZOOM_SCALE = 1.5  # input radius offset is in [-0.5, 0.5]
    FOV_DEG = 50.0
    EDGES = ((0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1))

    def __init__(self):
        self._polar = 0.0
        self._azimuth = 0.0
        self._radius = 0.0
        self._raw_image = None
        self._8bit_image = None
        self._image_colorscale = None

    def polar_change(self, value: float):
        self._polar = float(value)

    def azimuth_change(self, value: float):
        self._azimuth = float(value)

    def radius_change(self, value: float):
        self._radius = float(value)

    def encode_image(self, raw_image: np.ndarray) -> None:
        """raw_image: (H, W, 3) uint8. Plotly surfaces take one scalar per
        vertex, so quantize to the 216-color WEB palette and carry the
        palette as the colorscale (eval_utils.py:702-716)."""
        from PIL import Image

        dum = Image.fromarray(np.ones((3, 3, 3), np.uint8)).convert(
            "P", palette="WEB")
        idx_to_color = np.array(dum.getpalette()).reshape((-1, 3))
        self._raw_image = raw_image
        self._8bit_image = np.asarray(
            Image.fromarray(raw_image).convert("P", palette="WEB",
                                               dither=None))
        self._image_colorscale = [
            [i / 255.0, "rgb({}, {}, {})".format(*rgb)]
            for i, rgb in enumerate(idx_to_color)]

    def build_traces(self) -> dict:
        traces = {"cones": [], "surface": None}
        if self._raw_image is None:
            return traces
        h, w, _ = self._raw_image.shape
        y, z = np.meshgrid(np.linspace(-1.0, 1.0, w),
                           np.linspace(1.0, -1.0, h) * h / w)
        traces["surface"] = {
            "x": np.zeros((h, w)), "y": y, "z": z,
            "surfacecolor": self._8bit_image,
            "colorscale": self._image_colorscale,
        }
        input_cone = calc_cam_cone_pts_3d(
            0.0, 0.0, self.BASE_RADIUS, self.FOV_DEG)
        output_cone = calc_cam_cone_pts_3d(
            self._polar, self._azimuth,
            self.BASE_RADIUS + self._radius * self.ZOOM_SCALE, self.FOV_DEG)
        for cone, color, legend in ((input_cone, "green", "Input view"),
                                    (output_cone, "blue", "Target view")):
            segments = [
                (cone[e0].tolist(), cone[e1].tolist())
                for e0, e1 in self.EDGES]
            label_below = cone[0, 2] <= self.BASE_RADIUS / 2.0
            traces["cones"].append({
                "segments": segments, "color": color, "legend": legend,
                "apex": cone[0].tolist(),
                "label_offset": -0.05 if label_below else 0.05,
                "label_position": ("bottom center" if label_below
                                   else "top center"),
            })
        return traces

    def update_figure(self):
        traces = self.build_traces()
        try:
            import plotly.graph_objects as go
        except ImportError:
            return traces

        fig = go.Figure()
        if traces["surface"] is not None:
            s = traces["surface"]
            fig.add_trace(go.Surface(
                x=s["x"], y=s["y"], z=s["z"], surfacecolor=s["surfacecolor"],
                cmin=0, cmax=255, colorscale=s["colorscale"], showscale=False,
                lighting_diffuse=1.0, lighting_ambient=1.0,
                lighting_fresnel=1.0, lighting_roughness=1.0,
                lighting_specular=0.3))
        for cone in traces["cones"]:
            for i, (p0, p1) in enumerate(cone["segments"]):
                fig.add_trace(go.Scatter3d(
                    x=[p0[0], p1[0]], y=[p0[1], p1[1]], z=[p0[2], p1[2]],
                    mode="lines", line=dict(color=cone["color"], width=3),
                    name=cone["legend"], showlegend=(i == 0)))
            ax, ay, az = cone["apex"]
            fig.add_trace(go.Scatter3d(
                x=[ax], y=[ay], z=[az + cone["label_offset"]],
                showlegend=False, mode="text", text=cone["legend"],
                textposition=cone["label_position"]))

        b = self.SCENE_BOUNDS
        axis = dict(range=[-b, b], showticklabels=False, showgrid=True,
                    zeroline=False, showbackground=True, showspikes=False,
                    showline=False, ticks="")
        fig.update_layout(
            height=360, autosize=True, hovermode=False,
            margin=go.layout.Margin(l=0, r=0, b=0, t=0),
            showlegend=True,
            legend=dict(yanchor="bottom", y=0.01, xanchor="right", x=0.99),
            scene=dict(
                aspectmode="manual", aspectratio=dict(x=1, y=1, z=1.0),
                camera=dict(eye=dict(x=self.BASE_RADIUS - 1.6, y=0.0, z=0.6),
                            center=dict(x=0.0, y=0.0, z=0.0),
                            up=dict(x=0.0, y=0.0, z=1.0)),
                xaxis_title="", yaxis_title="", zaxis_title="",
                xaxis=axis, yaxis=dict(axis), zaxis=dict(axis)))
        return fig


# ---------------------------------------------------------------------------
# Outputs (eval_utils.py:450-566)
# ---------------------------------------------------------------------------


def draw_text(img01: np.ndarray, text: str, org=(6, 18), scale: float = 0.5,
              color=(1.0, 1.0, 1.0)) -> np.ndarray:
    import cv2

    # cv2 putText requires 8-bit images (OpenCV >= 5 asserts on float32).
    img = np.ascontiguousarray(
        (np.clip(img01, 0.0, 1.0) * 255.0).astype(np.uint8))
    cv2.putText(img, text, org, cv2.FONT_HERSHEY_SIMPLEX, scale,
                tuple(float(c) * 255.0 for c in color), 1, cv2.LINE_AA)
    return img.astype(np.float32) / 255.0


def quick_pca(latent: np.ndarray, k: int = 3) -> np.ndarray:
    """(T, H, W, C) latents -> (T, H, W, 3) PCA visualization in [0, 1]
    (eval_utils.py:482-508)."""
    t, h, w, c = latent.shape
    flat = latent.reshape(-1, c).astype(np.float64)
    flat = flat - flat.mean(axis=0)
    _, _, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:k].T
    lo, hi = np.percentile(proj, 2, axis=0), np.percentile(proj, 98, axis=0)
    proj = (proj - lo) / np.maximum(hi - lo, 1e-8)
    return np.clip(proj.reshape(t, h, w, k), 0.0, 1.0).astype(np.float32)


def write_video_and_frames(out_dp: str, name: str, video01: np.ndarray,
                           fps: int = 8, save_frames: bool = False) -> None:
    import cv2

    os.makedirs(out_dp, exist_ok=True)
    common.save_video_mp4(os.path.join(out_dp, f"{name}.mp4"), video01,
                          fps=fps)
    if save_frames:
        frames_dp = os.path.join(out_dp, name)
        os.makedirs(frames_dp, exist_ok=True)
        for i, frame in enumerate(video01):
            arr = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(frames_dp, f"{i:04d}.png"),
                        arr[..., ::-1])


def update_os_cpu_affinity(rank: int, num_workers: int) -> None:
    """Pin worker processes across cores (eval_utils.py:266-285)."""
    try:
        import psutil

        cores = list(range(psutil.cpu_count()))
        chunk = max(1, len(cores) // max(num_workers, 1))
        mine = cores[rank * chunk:(rank + 1) * chunk] or cores
        psutil.Process().cpu_affinity(mine)
    except Exception:
        pass


def make_sampler(bundle: ModelBundle, mesh_data: int = 1, mesh_fsdp: int = 1,
                 decoding_t: int = 14, return_latents: bool = False,
                 mesh_tensor: int = 1):
    """sample(batch, key) -> dict. A multi-chip mesh shards ONE clip's
    sampling across chips (gcd_tpu/engine/serving.py): batch-axis sharding
    over ("data","fsdp"), plus Megatron tensor-parallel param shardings when
    mesh_tensor > 1 (useful when B*T doesn't divide the mesh); otherwise
    plain single-device sampling."""
    import jax

    engine = bundle.engine
    if mesh_data * mesh_fsdp * mesh_tensor > 1:
        from gcd_tpu.parallel.mesh import create_mesh, make_param_shardings
        from gcd_tpu.engine.serving import make_sharded_sampler

        # "Use N chips": a host can expose more devices than the requested
        # serving mesh (e.g. --mesh_data 2 on an 8-device test host).
        n_mesh = mesh_data * mesh_fsdp * mesh_tensor
        mesh = create_mesh(data=mesh_data, fsdp=mesh_fsdp, tensor=mesh_tensor,
                           devices=jax.devices()[:n_mesh])
        # Params stay replicated for pure batch-sharded serving (a bf16 UNet
        # fits one chip); TP serving needs the Megatron param placements.
        param_shardings = (make_param_shardings(bundle.params, mesh)
                           if mesh_tensor > 1 else None)
        sharded = make_sharded_sampler(engine, mesh, decoding_t=decoding_t,
                                       param_shardings=param_shardings,
                                       return_latents=return_latents)

        def sample(batch, key):
            with kernel_flags(**program_flag_overrides(_cfg_extent(batch))):
                return sharded(bundle.params, batch, key)

        return sample

    def sample(batch, key):
        # Program-level kernel policy for the traced extent (the PERF_BATCH
        # batch-4 XLA layout pathology; see dispatch.program_flag_overrides).
        with kernel_flags(**program_flag_overrides(_cfg_extent(batch))):
            return engine.sample_video(bundle.params, batch, key,
                                       decoding_t=decoding_t,
                                       return_latents=return_latents)

    return sample


def _cfg_extent(batch) -> int:
    """CFG-doubled denoiser batch-time extent of a serving batch."""
    frames = batch.get("cond_frames", batch.get("jpg"))
    return 2 * int(frames.shape[0]) if frames is not None else 0
