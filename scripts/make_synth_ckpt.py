"""Synthesize a full-key reference-layout torch checkpoint (runbook dry-run).

No released GCD checkpoint can be fetched in this environment, so this CLI
manufactures one with the IDENTICAL key space, tensor layouts, dtype and
byte-scale as the published `kubric_gradual_max90.ckpt` family
(gcd-model/sgm/models/diffusion.py:191-219 key conventions, LitEma shadow
buffers per sgm/modules/ema.py) — values are the engine's own initializers
plus noise. Running the real-weights pipeline against it proves the day-one
path for actual released weights end to end:

    python scripts/make_synth_ckpt.py --config_path pretrained/kubric_gradual_max90.yaml \
        --output /tmp/synth_gcd.ckpt --dtype float16
    python scripts/convert_ckpt.py --config_path pretrained/kubric_gradual_max90.yaml \
        --model_path /tmp/synth_gcd.ckpt --output /tmp/synth_gcd_jax
    python scripts/test.py --config_path pretrained/kubric_gradual_max90.yaml \
        --model_path /tmp/synth_gcd_jax ...

tests/test_realweights_runbook.py drives exactly this sequence and asserts
the strict report shows 0 missing keys.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import numpy as np
    import jax

    from gcd_tpu.utils.config import load_config, instantiate_from_config
    from gcd_tpu.io.convert import synthesize_reference_state_dict

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--output", type=str, required=True,
                   help=".ckpt (torch.save) or .safetensors path")
    p.add_argument("--dtype", type=str, default="float16",
                   choices=["float16", "bfloat16", "float32"])
    p.add_argument("--frame_width", type=int, default=384)
    p.add_argument("--frame_height", type=int, default=256)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", action="store_true", default=True,
                   help="include LitEma shadow buffers (published GCD "
                        "checkpoints carry them)")
    p.add_argument("--no_ema", dest="ema", action="store_false")
    args = p.parse_args(argv)

    cfg = load_config(args.config_path)
    engine = instantiate_from_config(cfg["model"])
    print("Initializing parameter template (this sizes the state dict)...")
    params = jax.jit(
        lambda k: engine.init_params(
            k, img_hw=(args.frame_height, args.frame_width),
            t=args.num_frames)
    )(jax.random.PRNGKey(args.seed))
    params = jax.tree_util.tree_map(np.asarray, params)

    import torch

    dtype = {"float16": np.float16, "float32": np.float32,
             "bfloat16": None}[args.dtype]
    sd = synthesize_reference_state_dict(
        params, np.random.default_rng(args.seed),
        dtype=dtype if dtype is not None else np.float32,
        ema_offset=0.001 if args.ema else None)

    # Complete the key space against the independently-derived reference
    # manifest (scripts/make_ref_key_manifest.py dumps state_dict().keys()
    # from the reference's OWN torch modules). Real checkpoints carry keys
    # our engine deliberately has no parameters for — e.g. the UNUSED
    # decoder + post_quant_conv of conditioner.embedders.3's
    # AutoencoderKLModeOnly (the reference builds both halves even though
    # only encode runs) — and the converter must tolerate them as
    # "unexpected". Adding them here makes the synthetic checkpoint's key
    # space a faithful superset, not a mirror of our template.
    manifest_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "_golden", "ref_key_manifest.json")
    if os.path.exists(manifest_path):
        import json

        with open(manifest_path) as f:
            manifest = json.load(f)["keys"]
        vrng = np.random.default_rng(args.seed + 1)
        added = 0
        for key, shape in manifest.items():
            if key not in sd:
                base = np.float32 if dtype is None else dtype
                sd[key] = (vrng.standard_normal(shape) * 0.02).astype(base) \
                    if shape else np.asarray(0.0, base)
                added += 1
        print(f"manifest completion: +{added} reference-only keys "
              f"(e.g. embedders.3 decoder) from {manifest_path}")
    # reshape(v.shape): np.ascontiguousarray promotes 0-d arrays to (1,),
    # but the reference's LitEma decay/num_updates are 0-d scalars and the
    # key manifest asserts exact shapes.
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)).reshape(v.shape)
               for k, v in sd.items()}
    if args.dtype == "bfloat16":
        tensors = {k: (v.bfloat16() if v.is_floating_point() else v)
                   for k, v in tensors.items()}
    nbytes = sum(v.numel() * v.element_size() for v in tensors.values())
    print(f"{len(tensors)} tensors, {nbytes / 1e9:.2f} GB at {args.dtype}")

    if args.output.endswith(".safetensors"):
        from safetensors.torch import save_file

        save_file(tensors, args.output)
    else:
        torch.save({"state_dict": tensors, "global_step": 0}, args.output)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
