"""Dump the REFERENCE checkpoint key space to a committed manifest.

The synthetic-checkpoint runbook (scripts/make_synth_ckpt.py) generates its
key space FROM the converter's own template, which proves round-trip
self-consistency but not agreement with the published checkpoints. This
script closes that loop without weights: it instantiates the reference's OWN
torch modules (read-only mount, via tests/ref_oracle.py import stubs) at the
full published size and dumps ``state_dict().keys()`` + shapes, prefixed
exactly as ``DiffusionEngine`` nests them in a saved checkpoint
(gcd-model/sgm/models/diffusion.py:191-219: ``model.diffusion_model.*``,
``conditioner.embedders.N.*``, ``first_stage_model.*``, plus ``model_ema.*``
LitEma shadows per sgm/modules/ema.py — generated here by instantiating the
reference LitEma itself, so the dot-stripping convention is the reference's
own, not ours).

Families covered independently: the VideoUNet (the 1.5B bulk), the
first-stage AutoencodingEngine, conditioner embedders 1-5, and the full EMA
shadow space. Embedder 0 (FrozenOpenCLIPImageEmbedder) requires the
``open_clip`` package, which is not installed in this image — the reference
itself cannot instantiate it here, so its ~400 ``conditioner.embedders.0.``
keys stay converter-templated and are recorded in the manifest's
``excluded`` section with that reason.

Modules are built on torch's meta device: key names and shapes only, no
multi-GB allocation.

Usage:
    python scripts/make_ref_key_manifest.py \
        --output tests/_golden/ref_key_manifest.json

tests/test_realweights_runbook.py asserts the synthetic checkpoint covers
this manifest with exactly matching shapes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ref_config():
    from gcd_tpu.utils.config import load_config

    return load_config(
        "/root/reference/gcd-model/configs/train_kubric_max90.yaml")


def _state_keys(module, prefix: str) -> dict:
    return {prefix + k: list(v.shape)
            for k, v in module.state_dict().items()}


def build_manifest() -> dict:
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import ref_oracle

    if not ref_oracle.setup_reference_imports():
        raise RuntimeError("reference mount /root/reference is unavailable")

    # ref_oracle stubs LightningModule as `object` (enough for the parity
    # tests' plain-module imports); the autoencoder classes need a real
    # nn.Module base for state_dict(). Patch the stub BEFORE sgm.models.*
    # first imports it.
    import pytorch_lightning

    pytorch_lightning.LightningModule = torch.nn.Module
    for name in list(sys.modules):
        if name.startswith("sgm.models"):
            del sys.modules[name]

    from gcd_tpu.utils.config import get_by_path

    cfg = _ref_config()
    mp = get_by_path(cfg, "model.params")

    keys: dict = {}
    with torch.device("meta"):
        # --- UNet: model.diffusion_model.* --------------------------------
        from sgm.modules.diffusionmodules.video_model import VideoUNet

        unet = VideoUNet(**mp["network_config"]["params"])
        keys.update(_state_keys(unet, "model.diffusion_model."))

        # --- EMA shadows: the reference LitEma applied to the reference
        # UNet wrapped the way DiffusionEngine wraps it (self.model =
        # OpenAIWrapper(network) => named params "diffusion_model.*"),
        # saved under "model_ema." (diffusion.py:86, ema.py name-mangling).
        from sgm.modules.ema import LitEma

        class _Wrap(torch.nn.Module):
            def __init__(self, net):
                super().__init__()
                self.diffusion_model = net

        ema = LitEma(_Wrap(unet))
        keys.update(_state_keys(ema, "model_ema."))

        # --- First stage: first_stage_model.* -----------------------------
        from sgm.util import instantiate_from_config as ref_instantiate

        first_stage = ref_instantiate(mp["first_stage_config"])
        keys.update(_state_keys(first_stage, "first_stage_model."))

        # --- Conditioner embedders 1..5 (0 = open_clip, excluded) ---------
        embs = mp["conditioner_config"]["params"]["emb_models"]
        for i, emb_cfg in enumerate(embs):
            tgt = emb_cfg["target"]
            if "OpenCLIP" in tgt:
                continue
            emb = ref_instantiate(
                {"target": tgt, "params": emb_cfg.get("params", {})})
            keys.update(_state_keys(emb, f"conditioner.embedders.{i}."))

    return {
        "source_config":
            "/root/reference/gcd-model/configs/train_kubric_max90.yaml",
        "generator": "scripts/make_ref_key_manifest.py (reference torch "
                     "modules on the meta device via tests/ref_oracle.py)",
        "excluded": {
            "conditioner.embedders.0.": (
                "FrozenOpenCLIPImagePredictionEmbedder requires the "
                "open_clip package, absent from this image — the reference "
                "cannot instantiate it here either; these keys remain "
                "covered by the converter template only"),
        },
        "num_keys": len(keys),
        "keys": dict(sorted(keys.items())),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output",
                   default=os.path.join(REPO, "tests", "_golden",
                                        "ref_key_manifest.json"))
    args = p.parse_args(argv)
    m = build_manifest()
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(m, f, indent=1)
    print(f"wrote {m['num_keys']} keys -> {args.output}")


if __name__ == "__main__":
    main()
