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
