"""Benchmark evaluation with ground truth.

Behavioral reference: gcd-model/scripts/test.py — deterministic controls JSONs
freeze camera angles + frame bounds per scene (:174-271), eval pairs are
regenerated through the *training* dataset class via set_next_example
(:121-312), metrics are per-frame PSNR/SSIM plus visible/occluded variants
using the RGBD-reproject mask (:346-450) and sample diversity (:453-472),
results saved as mp4 + png + *_metrics.json (:808-876).

The reference's per-GPU mp.Pool worker sharding (:1031-1092) becomes a
`--shard i/n` argument (launch one process per host/chip).

The mirror strips `kubric_valtest_controls_*.json`; when absent, controls are
regenerated from the documented schema with a fixed RNG (--generate_controls).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import eval_utils, galleries
from gcd_tpu.utils.config import get_by_path, instantiate_from_config
from gcd_tpu.utils.metrics import clip_metrics, sample_diversity


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True,
                   help="config yaml; comma-separate for multi-model eval")
    p.add_argument("--model_path", type=str, default="",
                   help="checkpoint; comma-separate to evaluate a pool of "
                        "models on identical examples (test.py:1031-1092)")
    p.add_argument("--galleries", type=str,
                   default="rich1,rich2,rich3,rich5,rich6",
                   help="comma list of gallery layouts (rich1..rich7 or "
                        "'all'); see scripts/galleries.py")
    p.add_argument("--input", type=str, required=True,
                   help="scene list txt (eval/list/kubric_test*.txt) or "
                        "comma-separated scene indices")
    p.add_argument("--output", type=str, default="eval_output/test")
    p.add_argument("--controls_json", type=str, default="")
    p.add_argument("--generate_controls", action="store_true",
                   help="regenerate controls with a fixed RNG when the json "
                        "is unavailable")
    p.add_argument("--samples_per_scene", type=int, default=2)
    p.add_argument("--num_samples", type=int, default=2,
                   help="diffusion samples per example")
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--frame_width", type=int, default=384)
    p.add_argument("--frame_height", type=int, default=256)
    p.add_argument("--guider_max_scale", type=float, default=1.5)
    p.add_argument("--guider_min_scale", type=float, default=1.0)
    p.add_argument("--guidance_interval", type=str, default="",
                   help="lo,hi sigma band: CFG only inside it (opt-in speed mode)")
    p.add_argument("--decoding_t", type=int, default=14)
    p.add_argument("--support_ema", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shard", type=str, default="0/1")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="shard each clip's sampling over a data mesh axis "
                        "(multi-chip serving; mesh_data*mesh_fsdp chips)")
    p.add_argument("--mesh_fsdp", type=int, default=1)
    p.add_argument("--mesh_tensor", type=int, default=1,
                   help="Megatron tensor-parallel axis for serving (parallel/mesh.py)")
    p.add_argument("--cpu_devices", type=int, default=0,
                   help="force N virtual CPU devices (for mesh testing "
                        "without TPU chips; goes through jax.config)")
    p.add_argument("--use_ema", type=int, default=0)
    return p


def parse_scene_list(spec: str):
    """Scene list file with paths like .../scn02900, or indices."""
    if spec.endswith(".txt"):
        with open(spec) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        out = []
        for ln in lines:
            base = os.path.basename(ln.rstrip("/"))
            if base.startswith("scn"):
                out.append(int(base[3:]))
            elif base.startswith("scene_"):
                out.append(base)
            else:
                out.append(ln)
        return out
    out = []
    for part in spec.split(","):
        part = part.strip()
        out.append(int(part) if part.isdigit() else part)
    return out


def generate_controls(scenes, samples_per_scene: int, bundle, seed: int = 4):
    """Deterministic control generation following the schema of
    kubric_valtest_controls_*.json (test.py:176-191): per scene,
    sample_XX: {spherical_start[3], spherical_end[3], frame_start, frame_skip}."""
    rng = np.random.default_rng(seed)
    tc = bundle.train_config or {}
    dp = get_by_path(tc, "data.params", {}) or {}
    az_range = dp.get("azimuth_range", [0.0, 360.0])
    el_range = dp.get("elevation_range", [0.0, 50.0])
    r_range = dp.get("radius_range", [12.0, 18.0])
    d_az = dp.get("delta_azimuth_range", bundle.delta_azimuth_range)
    d_el = dp.get("delta_elevation_range", bundle.delta_elevation_range)
    d_r = dp.get("delta_radius_range", bundle.delta_radius_range)
    data_target = str(get_by_path(tc, "data.target", ""))
    if "pardom" in data_target:
        # PD has exactly 50 frames at 10 fps; skip is 1 or 2
        # (pardom_arbit.py:202, avail_frames hardcoded).
        avail = 50
        max_skip = 2
    else:
        avail = int(dp.get("avail_frames", 60))
        max_skip = None
    tcm = int(dp.get("model_frames", 14))

    controls = {}
    for scene in scenes:
        sd = {}
        for i in range(samples_per_scene):
            az_s = rng.uniform(*az_range)
            el_s = rng.uniform(*el_range)
            r_s = rng.uniform(*r_range)
            az_e = az_s + rng.uniform(*d_az)
            el_e = float(np.clip(el_s + rng.uniform(*d_el), *el_range))
            r_e = float(np.clip(r_s + rng.uniform(*d_r), *r_range))
            skip_hi = max_skip if max_skip is not None else max(avail // tcm, 1)
            frame_skip = int(rng.integers(1, skip_hi + 1))
            cover = frame_skip * (tcm - 1) + 1
            frame_start = int(rng.integers(0, max(avail - cover - 1, 0) + 1))
            sd[f"sample_{i:02d}"] = {
                "spherical_start": [float(az_s), float(el_s), float(r_s)],
                "spherical_end": [float(az_e), float(el_e), float(r_e)],
                "frame_start": frame_start,
                "frame_skip": frame_skip,
            }
        controls[str(scene)] = sd
    return controls


def build_eval_dataset(bundle, args):
    """Instantiate the *training* dataset class in deterministic eval mode
    (test.py:121-312)."""
    tc = bundle.train_config
    assert tc is not None, "need a train config to rebuild the data pipeline"
    data_cfg = dict(tc["data"])
    params = dict(data_cfg.get("params", {}))
    params["frame_width"] = args.frame_width
    params["frame_height"] = args.frame_height
    module = instantiate_from_config({"target": data_cfg["target"],
                                      "params": params})
    dset = module.val_dataset
    dset.reproject_rgbd = True  # enables the occlusion-mask baseline
    return dset


def render_example(dset, scene, control):
    """Deterministic data-side render of one eval example."""
    if isinstance(scene, int):
        # Kubric: [scene_idx, frame_skip, frame_start, reverse, az_s, az_e,
        # el_s, el_e, r_s, r_e]
        ss, se = control["spherical_start"], control["spherical_end"]
        dset.set_next_example(
            scene, control["frame_skip"], control["frame_start"], False,
            ss[0], se[0], ss[1], se[1], ss[2], se[2])
    else:
        dset.set_next_example(0, scene, control["frame_skip"],
                              control["frame_start"], False)

    t0 = time.time()
    example = dset[0]
    print(f"  data render: {time.time() - t0:.1f}s")

    from gcd_tpu.data.loader import collate_fn

    return collate_fn([example])


def process_example(bundle, sampler, args, dset, batch_np, scene, control,
                    key, out_dp, tag: str, enabled_galleries):
    import jax
    import jax.numpy as jnp

    batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
             for k, v in batch_np.items()}

    gt = (np.asarray(batch_np["jpg"]) + 1.0) / 2.0
    reproject = None
    if "reproject" in batch_np:
        reproject = (np.asarray(batch_np["reproject"]) + 1.0) / 2.0

    samples, latents = [], []
    for s in range(args.num_samples):
        t0 = time.time()
        out = sampler(batch, jax.random.fold_in(key, s))
        samples.append(np.asarray(out["sampled_video"]))
        if "sampled_z" in out:
            latents.append(np.asarray(out["sampled_z"]))
        print(f"  sample {s}: {time.time() - t0:.1f}s")

    # Per-frame x per-sample metrics drive both the galleries and the
    # scalar summary (reference test.py:346-496).
    frame_metrics, uncertainty = clip_metrics(samples, gt, reproject)
    metrics = {
        "psnr": float(np.nanmean(frame_metrics["frame_psnr"])),
        "ssim": float(np.nanmean(frame_metrics["frame_ssim"])),
        "diversity_std": sample_diversity(samples),
    }
    if reproject is not None:
        for ours, ref in (("psnr_visible", "psnr_vis"),
                          ("psnr_occluded", "psnr_occ"),
                          ("ssim_visible", "ssim_vis"),
                          ("ssim_occluded", "ssim_occ")):
            metrics[ours] = float(
                np.nanmean(frame_metrics[f"frame_{ref}"]))

    # Semantic output head: mIoU by matching rendered colors back to the
    # ontology palette (README 'Pretrained Models' mIoU protocol).
    if getattr(dset, "output_modality", "rgb") == "segm":
        from gcd_tpu.utils.metrics import miou, rgb_to_class_ids

        palette = np.asarray(dset.ontology["semantic_id_rgb_map"])
        ious = []
        for s in samples:
            for i in range(s.shape[0]):
                pred_ids = rgb_to_class_ids(s[i], palette)
                gt_ids = rgb_to_class_ids(gt[i], palette)
                ious.append(miou(pred_ids, gt_ids))
        metrics["miou"] = float(np.nanmean(ious))
    metrics["scene"] = str(scene)
    metrics["control"] = control

    cond = np.asarray(out["cond_video"])
    vis = galleries.create_visualizations(
        cond, gt, samples, frame_metrics, uncertainty=uncertainty,
        reproject_rgb=reproject, pred_samples_latent=latents or None,
        model_name=bundle.model_name,
        target_title=f"Target ({galleries.controls_friendly_title(control)})",
        enable=enabled_galleries)
    galleries.save_visualizations(
        vis, out_dp, tag, frame_rate=int(control.get("frame_rate", 8)))
    for s, samp in enumerate(samples):
        eval_utils.write_video_and_frames(out_dp, f"{tag}_out{s}", samp)
    with open(os.path.join(out_dp, f"{tag}_metrics.json"), "w") as f:
        json.dump(
            {**metrics,
             **{k: np.asarray(v).tolist()
                for k, v in frame_metrics.items()}},
            f, indent=2)
    return metrics


def main(argv=None):
    import jax

    args = get_parser().parse_args(argv)
    if args.cpu_devices > 0:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    key = jax.random.PRNGKey(args.seed)

    # Multi-model pool (reference test.py:1031-1092): examples are sharded
    # across workers via --shard, while EVERY model sees every example — the
    # data render happens once per example and is reused across the pool.
    config_paths = [c for c in args.config_path.split(",") if c]
    model_paths = [m for m in args.model_path.split(",") if m] or [""]
    if len(config_paths) == 1:
        config_paths = config_paths * len(model_paths)
    assert len(config_paths) == len(model_paths), \
        "need one --config_path per --model_path (or a single shared one)"

    bundles = [
        eval_utils.load_model_bundle(
            cp, mp, support_ema=bool(args.support_ema),
            num_steps=args.num_steps, num_frames=args.num_frames,
            max_scale=args.guider_max_scale, min_scale=args.guider_min_scale,
            guidance_interval=(tuple(map(float, args.guidance_interval.split(",")))
                               if args.guidance_interval else None),
            img_hw=(args.frame_height, args.frame_width), verbose=True)
        for cp, mp in zip(config_paths, model_paths)
    ]
    samplers = [
        eval_utils.make_sampler(b, args.mesh_data, args.mesh_fsdp,
                                decoding_t=args.decoding_t,
                                mesh_tensor=args.mesh_tensor,
                                return_latents=True)
        for b in bundles
    ]
    enabled = (("rich1", "rich2", "rich3", "rich4", "rich5", "rich6", "rich7")
               if args.galleries == "all"
               else tuple(g for g in args.galleries.split(",") if g))

    scenes = parse_scene_list(args.input)
    shard_i, shard_n = map(int, args.shard.split("/"))
    scenes = scenes[shard_i::shard_n]

    if args.controls_json and os.path.exists(args.controls_json):
        with open(args.controls_json) as f:
            controls = json.load(f)
    else:
        if not args.generate_controls:
            print("No controls json found; regenerating deterministically "
                  "(pass --controls_json to use the official file).")
        controls = generate_controls(scenes, args.samples_per_scene,
                                     bundles[0], seed=4)

    dset = build_eval_dataset(bundles[0], args)
    out_dps = []
    seen_names = {}
    for b in bundles:
        # Distinct checkpoints can shorten to the same name (e.g. two
        # runs' last.ckpt) — suffix duplicates so evals never collide.
        name = b.model_name
        if name in seen_names:
            seen_names[name] += 1
            name = f"{name}_{seen_names[name]}"
        else:
            seen_names[name] = 0
        dp = os.path.join(args.output, name)
        os.makedirs(dp, exist_ok=True)
        out_dps.append(dp)

    all_metrics = [[] for _ in bundles]
    n_ex = 0
    for i, scene in enumerate(scenes):
        scene_controls = controls.get(str(scene), {})
        for sample_name, control in sorted(scene_controls.items()):
            tag = f"{scene}_{sample_name}"
            print(f"[{i + 1}/{len(scenes)}] {tag}")
            try:
                batch_np = render_example(dset, scene, control)
            except Exception as e:
                print(f"  data render failed: {e}")
                continue
            ex_key = jax.random.fold_in(key, n_ex)
            n_ex += 1
            for bi, (bundle, sampler) in enumerate(zip(bundles, samplers)):
                try:
                    m = process_example(bundle, sampler, args, dset, batch_np,
                                        scene, control, ex_key, out_dps[bi],
                                        tag, enabled)
                    all_metrics[bi].append(m)
                    print(f"  [{bundle.model_name}] PSNR {m['psnr']:.2f} dB "
                          f"SSIM {m['ssim']:.3f}")
                except Exception as e:
                    print(f"  [{bundle.model_name}] failed: {e}")

    for bi, bundle in enumerate(bundles):
        ms = all_metrics[bi]
        summary = {
            k: float(np.nanmean([m[k] for m in ms]))
            for k in ms[0] if isinstance(ms[0][k], (int, float))
        } if ms else {}
        with open(os.path.join(out_dps[bi], "summary_metrics.json"),
                  "w") as f:
            json.dump({"summary": summary, "examples": ms}, f, indent=2)
        print(f"[{bundle.model_name}] summary over {len(ms)} examples: "
              f"{summary}")


if __name__ == "__main__":
    main()
