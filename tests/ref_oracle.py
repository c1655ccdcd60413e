"""Test oracle: import the *reference* torch models (read-only mount at
/root/reference) with lightweight stubs for their unavailable dependencies.

Used only for numerical-parity tests (SURVEY.md section 4: "numerical parity
tests against saved reference activations"); no reference code is copied or
shipped. All parity tests skip cleanly when the mount is absent.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REF_PATH = "/root/reference/gcd-model"

_STUBBED = False


class _AnyAttr:
    def __getattr__(self, k):
        return _AnyAttr()

    def __call__(self, *a, **k):
        return _AnyAttr()


def _stub(name, attrs=None):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in (attrs or {}).items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def setup_reference_imports() -> bool:
    """Install dependency stubs + reference path. Returns False if the
    reference mount is unavailable."""
    global _STUBBED
    import os

    if not os.path.isdir(REF_PATH):
        return False
    if _STUBBED:
        return True

    _stub("pytorch_lightning",
          {"LightningModule": object, "LightningDataModule": object})
    _stub("lovely_tensors", {"monkey_patch": lambda: None})
    _stub("lovely_numpy", {"lo": lambda x: x})
    _stub("mediapy")
    _stub("wandb")
    kornia = _stub("kornia", {"geometry": _AnyAttr(), "enhance": _AnyAttr()})
    _stub("open_clip", {"create_model_and_transforms": _AnyAttr()})
    _stub("omegaconf", {"ListConfig": list, "OmegaConf": _AnyAttr(),
                        "DictConfig": dict})
    peft = _stub("peft")
    tuners = _stub("peft.tuners")
    _stub("peft.tuners.lora", {"layer": _AnyAttr()})
    peft.tuners = tuners
    tv = _stub("torchvision", {"models": _AnyAttr(), "transforms": _AnyAttr()})
    _stub("torchvision.models")
    _stub("torchvision.transforms", {"functional": _AnyAttr()})
    _stub("torchvision.transforms.functional")
    _stub("skimage", {"metrics": _AnyAttr()})
    _stub("skimage.metrics")
    try:
        import rich  # noqa: F401  — real package is present in this image
    except ImportError:
        _stub("rich", {"print": print})

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    _STUBBED = True
    return True


def get_reference_video_unet(**kwargs):
    if not setup_reference_imports():
        return None
    from sgm.modules.diffusionmodules.video_model import VideoUNet

    return VideoUNet(**kwargs)


def get_reference_vae():
    if not setup_reference_imports():
        return None, None
    from sgm.modules.diffusionmodules.model import Encoder
    from sgm.modules.autoencoding.temporal_ae import VideoDecoder

    return Encoder, VideoDecoder
