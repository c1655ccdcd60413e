"""LPIPS perceptual metric (VGG16 variant).

Behavioral reference: gcd-model/sgm/modules/autoencoding/lpips/loss/lpips.py —
VGG16 features at relu{1_2,2_2,3_3,4_3,5_3}, per-channel unit normalization,
squared differences, 1x1 zero-bias linear heads, spatial mean, layer sum. Used
by DiffusionEngine.validation_step (diffusion.py:342) and the optional
`loss_type: lpips`.

The reference auto-downloads VGG + LPIPS-lin weights; this environment has no
egress, so weights must be supplied: `load_lpips_params(path)` accepts either
the torchvision VGG16 state dict + lpips "vgg.pth" lin weights, or an
orbax/npz export. Without weights the metric is unavailable and callers fall
back to PSNR/SSIM-only validation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gcd_tpu.utils.config import register

# Channel counts of the tapped VGG16 stages.
VGG_STAGES = [64, 128, 256, 512, 512]
# torchvision VGG16 `features` conv indices per stage.
VGG_CONV_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]

SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class VGG16Features(nn.Module):
    """VGG16 trunk returning the five tapped activations. Input (N, H, W, 3)
    in [-1, 1] (LPIPS ScalingLayer applied internally)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = (x - SHIFT) / SCALE
        taps = []
        for stage, conv_ids in enumerate(VGG_CONV_IDX):
            for ci in conv_ids:
                x = nn.Conv(VGG_STAGES[stage], (3, 3),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"features_{ci}")(x)
                x = nn.relu(x)
            taps.append(x)
            if stage < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Full LPIPS head: distance between two images in [-1, 1], NHWC."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        vgg = VGG16Features(dtype=self.dtype, name="net")
        fa = vgg(a)
        fb = vgg(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa**2, axis=-1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb**2, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            w = self.param(f"lin{i}_weight", nn.initializers.ones,
                           (VGG_STAGES[i],), jnp.float32)
            d = jnp.sum(diff * jnp.abs(w)[None, None, None, :], axis=-1)
            total = total + d.mean(axis=(1, 2))
        return total  # (N,)


def load_lpips_params(vgg_path: str, lins_path: Optional[str] = None) -> Dict:
    """Convert torchvision VGG16 + lpips lin weights into the LPIPS param tree.

    vgg_path: torchvision vgg16 state dict (.pth) or a combined export.
    lins_path: the lpips 'vgg.pth' lin weights (lin{i}.model.1.weight)."""
    import torch

    sd = torch.load(vgg_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params: Dict = {"net": {}}
    for stage, conv_ids in enumerate(VGG_CONV_IDX):
        for ci in conv_ids:
            w = sd[f"features.{ci}.weight"].numpy().transpose(2, 3, 1, 0)
            b = sd[f"features.{ci}.bias"].numpy()
            params["net"][f"features_{ci}"] = {"kernel": w, "bias": b}
    if lins_path:
        lsd = torch.load(lins_path, map_location="cpu", weights_only=False)
        for i in range(5):
            key = f"lin{i}.model.1.weight"
            w = lsd[key].numpy().reshape(-1)  # (1, C, 1, 1) -> (C,)
            params[f"lin{i}_weight"] = w
    else:
        for i in range(5):
            params[f"lin{i}_weight"] = np.ones(VGG_STAGES[i], dtype=np.float32)
    return params


def lpips_available(path: Optional[str]) -> bool:
    import os

    return bool(path) and os.path.exists(path)


@register("sgm.modules.autoencoding.losses.lpips.LatentLPIPS")
class LatentLPIPS:
    """Latent-space L2 + decoded-image LPIPS loss
    (sgm/modules/autoencoding/losses/lpips.py:8-74).

    Functional: the decoder engine and LPIPS net carry no state here; their
    params are passed per call. `perceptual_weight > 0` requires both
    `decoder_params` and `lpips_params` (loud error, not a silent drop).

    The `scale_*` flags use jax.image.resize bicubic; the reference's
    `antialias=True` low-pass is not applied (only relevant when decoder and
    target resolutions differ, unused by all shipped configs).
    """

    def __init__(
        self,
        decoder_config: Dict,
        perceptual_weight: float = 1.0,
        latent_weight: float = 1.0,
        scale_input_to_tgt_size: bool = False,
        scale_tgt_to_input_size: bool = False,
        perceptual_weight_on_inputs: float = 0.0,
    ):
        from gcd_tpu.utils.config import instantiate_from_config

        assert not (scale_input_to_tgt_size and scale_tgt_to_input_size)
        self.decoder = instantiate_from_config(decoder_config)
        self.perceptual = LPIPS()
        self.perceptual_weight = perceptual_weight
        self.latent_weight = latent_weight
        self.scale_input_to_tgt_size = scale_input_to_tgt_size
        self.scale_tgt_to_input_size = scale_tgt_to_input_size
        self.perceptual_weight_on_inputs = perceptual_weight_on_inputs

    def __call__(
        self,
        latent_inputs: jnp.ndarray,
        latent_predictions: jnp.ndarray,
        image_inputs: Optional[jnp.ndarray] = None,
        split: str = "train",
        decoder_params=None,
        lpips_params=None,
    ):
        """All images/latents NHWC. Returns (loss, log) like the reference."""
        log = {}
        loss = (latent_inputs - latent_predictions) ** 2
        log[f"{split}/latent_l2_loss"] = loss.mean()

        needs_decode = (self.perceptual_weight > 0.0
                        or self.perceptual_weight_on_inputs > 0.0)
        if needs_decode and (decoder_params is None or lpips_params is None):
            raise ValueError(
                "LatentLPIPS with perceptual terms needs decoder_params and "
                "lpips_params")

        recons = None
        if self.perceptual_weight > 0.0:
            recons = self.decoder.decode(decoder_params, latent_predictions)
            targets = self.decoder.decode(decoder_params, latent_inputs)
            p = self.perceptual.apply({"params": lpips_params}, targets,
                                      recons)
            loss = (self.latent_weight * loss.mean()
                    + self.perceptual_weight * p.mean())
            log[f"{split}/perceptual_loss"] = p.mean()

        if self.perceptual_weight_on_inputs > 0.0:
            assert image_inputs is not None
            if recons is None:
                recons = self.decoder.decode(decoder_params,
                                             latent_predictions)
            if self.scale_input_to_tgt_size:
                image_inputs = jax.image.resize(
                    image_inputs,
                    image_inputs.shape[:1] + recons.shape[1:],
                    method="bicubic")
            elif self.scale_tgt_to_input_size:
                recons = jax.image.resize(
                    recons, recons.shape[:1] + image_inputs.shape[1:],
                    method="bicubic")
            p2 = self.perceptual.apply({"params": lpips_params},
                                       image_inputs, recons)
            loss = loss + self.perceptual_weight_on_inputs * p2.mean()
            log[f"{split}/perceptual_loss_on_inputs"] = p2.mean()
        return loss, log
