"""Pre-convert a reference torch checkpoint into an orbax checkpoint.

Loading a 20 GB `.safetensors`/`.ckpt` through the torch converter takes
minutes and host RAM at every eval launch; this CLI does it once and writes an
orbax step directory that `scripts/test.py`/`infer.py`/`main.py --resume` load
directly.

Usage:
    python scripts/convert_ckpt.py --config_path pretrained/kubric_gradual_max90.yaml \
        --model_path /ckpts/kubric_gradual_max90.ckpt --output /ckpts/kubric_gradual_max90_jax
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax

    from gcd_tpu.utils.config import load_config, instantiate_from_config
    from gcd_tpu.io.checkpoint import save_checkpoint

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True,
                   help="train or inference yaml with the model block")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--output", type=str, required=True,
                   help="orbax checkpoint dir (a step_0 entry is written)")
    p.add_argument("--frame_width", type=int, default=384)
    p.add_argument("--frame_height", type=int, default=256)
    p.add_argument("--num_frames", type=int, default=14)
    args = p.parse_args(argv)

    cfg = load_config(args.config_path)
    engine = instantiate_from_config(cfg["model"])
    key = jax.random.PRNGKey(0)
    print("Initializing parameter template...")
    params = jax.jit(
        lambda k: engine.init_params(
            k, img_hw=(args.frame_height, args.frame_width),
            t=args.num_frames)
    )(key)
    print(f"Converting {args.model_path}...")
    params = engine.load_torch_checkpoint(args.model_path, params)
    path = save_checkpoint(args.output, 0, {"params": params, "opt_state": None,
                                            "step": 0, "ema": None})
    print(f"Wrote {path}")


if __name__ == "__main__":
    main()
