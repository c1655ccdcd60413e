"""Interactive demo app.

Behavioral reference: gcd-model/scripts/gradio_app.py — loads one model bundle
(:286-289), UI with image-or-video input, frame offset/stride/rate sliders,
azimuth/elevation/radius sliders bounded by the train ranges, sample count and
advanced params (:315-499), a 3D camera-frustum plot, and in/out/side-by-side
mp4 outputs (:206-241).

gradio is not installed in this image; when absent the same `main_run` backend
is exposed through a minimal CLI loop (--once) so the demo logic stays
exercised end-to-end.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import eval_utils


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--output", type=str, default="eval_output/gradio")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--frame_width", type=int, default=384)
    p.add_argument("--frame_height", type=int, default=256)
    p.add_argument("--examples_dir", type=str,
                   default=os.path.join(
                       os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "eval", "gradio_examples"))
    # CLI fallback (no gradio):
    p.add_argument("--once", type=str, default="",
                   help="run one inference on this input file and exit")
    p.add_argument("--azimuth", type=float, default=30.0)
    p.add_argument("--elevation", type=float, default=15.0)
    p.add_argument("--radius", type=float, default=0.0)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--guidance_interval", type=str, default="",
                   help="lo,hi sigma band: CFG only inside it (opt-in speed mode)")
    return p


def make_camera_visualizer(bundle, input_fp=None, azimuth=0.0, elevation=0.0,
                           radius=0.0, frame_width=384, frame_height=256):
    """CameraVisualizer loaded with the first conditioning frame and the
    requested target pose (gradio_app.py:154-189). The radius slider (meters,
    train delta range) is normalized to the reference plot's [-0.5, 0.5]
    zoom offset."""
    vis = eval_utils.CameraVisualizer()
    vis.azimuth_change(azimuth)
    vis.polar_change(elevation)
    r_lo, r_hi = bundle.delta_radius_range
    r_span = max(abs(r_lo), abs(r_hi), 1e-6)
    vis.radius_change(float(np.clip(radius / r_span, -1.0, 1.0)) * 0.5)
    if input_fp:
        frame0 = eval_utils.load_image_or_video(
            input_fp, 1, center_crop=True, frame_width=frame_width,
            frame_height=frame_height)[0]
        vis.encode_image((np.clip(frame0, 0, 1) * 255).astype(np.uint8))
    return vis


def main_run(bundle, args, action, input_fp, azimuth, elevation, radius,
             num_samples=1, seed=0):
    """Demo backend (gradio_app.py:115-265): 'vis'/'rand' update the camera
    plot; 'run' executes inference and writes in/out/side mp4s."""
    import jax
    import jax.numpy as jnp

    if action == "rand":
        rng = np.random.default_rng()
        azimuth = float(rng.uniform(*bundle.delta_azimuth_range))
        elevation = float(rng.uniform(*bundle.delta_elevation_range))
        radius = float(rng.uniform(*bundle.delta_radius_range))
    if action in ("vis", "rand"):
        vis = make_camera_visualizer(
            bundle, input_fp, azimuth, elevation, radius,
            args.frame_width, args.frame_height)
        return {"azimuth": azimuth, "elevation": elevation, "radius": radius,
                "figure": vis.update_figure()}

    input_rgb = eval_utils.load_image_or_video(
        input_fp, args.num_frames, center_crop=True,
        frame_width=args.frame_width, frame_height=args.frame_height)
    batch_np = eval_utils.construct_batch(
        input_rgb, azimuth, elevation, radius, args.num_frames, 12, 127,
        0.02, False, bundle, rng=np.random.default_rng(seed))
    batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
             for k, v in batch_np.items()}

    key = jax.random.PRNGKey(seed)
    outputs = []
    for s in range(num_samples):
        out = bundle.engine.sample_video(
            bundle.params, batch, jax.random.fold_in(key, s),
            decoding_t=min(args.num_frames, 7))
        outputs.append(np.asarray(out["sampled_video"]))

    base = os.path.splitext(os.path.basename(input_fp))[0]
    cond = np.asarray(out["cond_video"])
    eval_utils.write_video_and_frames(args.output, f"{base}_in", cond)
    for s, sampled in enumerate(outputs):
        eval_utils.write_video_and_frames(args.output, f"{base}_out{s}", sampled)
    side = np.concatenate([cond, outputs[0]], axis=2)
    eval_utils.write_video_and_frames(args.output, f"{base}_ioside", side)
    return {
        "in": os.path.join(args.output, f"{base}_in.mp4"),
        "out": os.path.join(args.output, f"{base}_out0.mp4"),
        "ioside": os.path.join(args.output, f"{base}_ioside.mp4"),
    }


def run_gradio(bundle, args):
    import gradio as gr

    az_lo, az_hi = bundle.delta_azimuth_range
    el_lo, el_hi = bundle.delta_elevation_range
    r_lo, r_hi = bundle.delta_radius_range

    def on_run(video, image, azimuth, elevation, radius, num_samples, seed):
        input_fp = video or image
        res = main_run(bundle, args, "run", input_fp, azimuth, elevation,
                       radius, int(num_samples), int(seed))
        return res["in"], res["out"], res["ioside"]

    def on_vis(video, image, azimuth, elevation, radius):
        res = main_run(bundle, args, "vis", video or image, azimuth,
                       elevation, radius)
        return res["figure"]

    def on_rand(video, image, azimuth, elevation, radius):
        res = main_run(bundle, args, "rand", video or image, azimuth,
                       elevation, radius)
        return (res["figure"], res["azimuth"], res["elevation"],
                res["radius"])

    with gr.Blocks(title="GCD-TPU: Generative Camera Dolly") as demo:
        gr.Markdown("# Generative Camera Dolly (TPU)")
        with gr.Row():
            with gr.Column():
                video_in = gr.Video(label="Input video")
                image_in = gr.Image(label="...or input image", type="filepath")
                azimuth = gr.Slider(az_lo, az_hi, value=(az_hi + az_lo) / 2,
                                    label="Δ azimuth (deg)")
                elevation = gr.Slider(el_lo, el_hi, value=(el_hi + el_lo) / 2,
                                      label="Δ elevation (deg)")
                radius = gr.Slider(r_lo, r_hi, value=0.0, label="Δ radius (m)")
                num_samples = gr.Slider(1, 4, value=1, step=1,
                                        label="Samples")
                seed = gr.Number(value=0, label="Seed")
                with gr.Row():
                    vis_btn = gr.Button("Visualize poses")
                    rand_btn = gr.Button("Random camera")
                run_btn = gr.Button("Generate", variant="primary")
            with gr.Column():
                # 3D input/target frustum figure (reference gradio_app.py
                # :369-377 + eval_utils.py CameraVisualizer).
                pose_plot = gr.Plot(label="Camera poses")
                out_in = gr.Video(label="Conditioning")
                out_sample = gr.Video(label="Generated")
                out_side = gr.Video(label="Side by side")
        pose_inputs = [video_in, image_in, azimuth, elevation, radius]
        vis_btn.click(on_vis, pose_inputs, [pose_plot])
        rand_btn.click(on_rand, pose_inputs,
                       [pose_plot, azimuth, elevation, radius])
        for slider in (azimuth, elevation, radius):
            slider.release(on_vis, pose_inputs, [pose_plot])
        run_btn.click(on_run,
                      [video_in, image_in, azimuth, elevation, radius,
                       num_samples, seed],
                      [out_in, out_sample, out_side])
        if os.path.isdir(args.examples_dir):
            examples = sorted(
                os.path.join(args.examples_dir, f)
                for f in os.listdir(args.examples_dir)
                if f.endswith((".mp4", ".png", ".jpg")))
            if examples:
                gr.Examples(examples[:8], inputs=[video_in])
    demo.launch(server_port=args.port, server_name="0.0.0.0")


def main(argv=None):
    args = get_parser().parse_args(argv)
    bundle = eval_utils.load_model_bundle(
        args.config_path, args.model_path,
        num_steps=args.num_steps, num_frames=args.num_frames,
        guidance_interval=(tuple(map(float, args.guidance_interval.split(",")))
                           if args.guidance_interval else None),
        img_hw=(args.frame_height, args.frame_width), verbose=True)

    if args.once:
        res = main_run(bundle, args, "run", args.once, args.azimuth,
                       args.elevation, args.radius, args.num_samples)
        print(res)
        return

    try:
        run_gradio(bundle, args)
    except ImportError:
        print("gradio is not installed; use --once <input> for CLI inference")
        sys.exit(2)


if __name__ == "__main__":
    main()
