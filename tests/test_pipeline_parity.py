"""Infer-level torch-vs-jax pipeline parity (VERDICT round-1 next-round #4).

Runs the reference's full inference pipeline in torch — EulerEDM sampler +
LinearPredictionGuider CFG + Denoiser(VScalingWithEDMcNoise) + VideoUNet,
then VideoDecoder — on the tiny smoke-config architecture with seeded shared
weights and fixed noise, and asserts our jax engine stack (instantiated from
the SAME sgm.* target strings) reproduces the final sampled video.

This is everything `scripts/infer.py` exercises except the conditioner
embedders (CLIP towers have their own parity tests, and the reference's
FrozenOpenCLIPImageEmbedder cannot construct offline): the cond dict is
injected post-conditioner. Reference path: sgm/models/diffusion.py:434-447
(sample), sgm/modules/diffusionmodules/sampling.py:101-121 (hot loop).
"""

import numpy as np
import pytest

from tests.ref_oracle import setup_reference_imports

pytestmark = pytest.mark.skipif(
    not setup_reference_imports(), reason="reference mount unavailable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gcd_tpu.io.convert import convert_state_dict_to_params  # noqa: E402
from gcd_tpu.utils.config import instantiate_from_config  # noqa: E402
from tests.test_parity_torch import (TINY_DD, TINY_UNET,  # noqa: E402
                                     fill_zero_params)

T, H, W = 3, 16, 16  # latent hw
STEPS = 4

SAMPLER_CFG = {
    "target": "sgm.modules.diffusionmodules.sampling.EulerEDMSampler",
    "params": {
        "num_steps": STEPS,
        "discretization_config": {
            "target":
                "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_max": 700.0},
        },
        "guider_config": {
            "target": "sgm.modules.diffusionmodules.guiders."
                      "LinearPredictionGuider",
            "params": {"num_frames": T, "max_scale": 2.5, "min_scale": 1.0},
        },
    },
}
DENOISER_CFG = {
    "target": "sgm.modules.diffusionmodules.denoiser.Denoiser",
    "params": {
        "scaling_config": {
            "target": "sgm.modules.diffusionmodules.denoiser_scaling."
                      "VScalingWithEDMcNoise",
        },
    },
}


def _cond(rng):
    return {
        "crossattn": rng.normal(size=(T, 1, 24)).astype(np.float32),
        "vector": rng.normal(size=(T, 26)).astype(np.float32),
        "concat": rng.normal(size=(T, 4, H, W)).astype(np.float32) * 0.1,
    }


def test_sampling_pipeline_parity():
    import torch

    from sgm.util import instantiate_from_config as sgm_instantiate
    from tests.test_parity_torch import _torch_unet
    from gcd_tpu.models.unet import VideoUNet
    from gcd_tpu.models.vae import VideoDecoder

    rng = np.random.default_rng(11)
    cond_np = _cond(rng)
    uc_np = _cond(rng)
    noise = rng.normal(size=(T, 4, H, W)).astype(np.float32)
    ioi2 = np.zeros((2, T), dtype=np.float32)

    # ---- torch reference pipeline -------------------------------------
    net = _torch_unet()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    ref_sampler_cfg = {
        "target": SAMPLER_CFG["target"],
        "params": {**SAMPLER_CFG["params"], "device": "cpu"},
    }
    ref_sampler = sgm_instantiate(ref_sampler_cfg)
    ref_denoiser = sgm_instantiate(DENOISER_CFG)

    def ref_network(x, t, c, **kwargs):
        x = torch.cat((x, c["concat"]), dim=1)
        return net(x, timesteps=t, context=c.get("crossattn"),
                   y=c.get("vector"), **kwargs)

    class _Wrapped(torch.nn.Module):
        def forward(self, x, t, c, **kw):
            return ref_network(x, t, c, **kw)

    wrapped = _Wrapped()
    tt = lambda a: torch.from_numpy(np.asarray(a))  # noqa: E731
    cond_t = {k: tt(v) for k, v in cond_np.items()}
    uc_t = {k: tt(v) for k, v in uc_np.items()}

    def denoiser_closure(input, sigma, c):
        return ref_denoiser(wrapped, input, sigma, c,
                            image_only_indicator=tt(ioi2),
                            num_video_frames=T)

    with torch.no_grad():
        # copy: prepare_sampling_loop scales x IN PLACE (sampling.py:54) and
        # torch.from_numpy shares the numpy buffer the jax side reads later
        z_ref = ref_sampler(denoiser_closure, tt(noise.copy()), cond_t,
                            uc=uc_t).numpy()

    torch.manual_seed(21)
    _, ref_dec_cls = __import__("tests.ref_oracle",
                                fromlist=["get_reference_vae"]
                                ).get_reference_vae()
    ref_dec = ref_dec_cls(**TINY_DD, video_kernel_size=[3, 1, 1]).eval()
    fill_zero_params(ref_dec, seed=121)
    dec_sd = {k: v.detach().numpy() for k, v in ref_dec.state_dict().items()}
    with torch.no_grad():
        video_ref = ref_dec(tt(z_ref / 0.18215), timesteps=T).numpy()

    # ---- jax pipeline from the same sgm.* target strings --------------
    model = VideoUNet(**TINY_UNET)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((T, H, W, 8)),
                           jnp.zeros((T,)), jnp.zeros((T, 1, 24)),
                           jnp.zeros((T, 26)), num_video_frames=T,
                           image_only_indicator=jnp.zeros((1, T)))
    )["params"]
    params, missing, _ = convert_state_dict_to_params(sd, template)
    assert missing == []

    sampler = instantiate_from_config(SAMPLER_CFG)
    denoiser = instantiate_from_config(DENOISER_CFG)

    nhwc = lambda a: jnp.asarray(np.moveaxis(a, 1, -1))  # noqa: E731
    cond_j = {k: (nhwc(v) if v.ndim == 4 else jnp.asarray(v))
              for k, v in cond_np.items()}
    uc_j = {k: (nhwc(v) if v.ndim == 4 else jnp.asarray(v))
            for k, v in uc_np.items()}

    def network(x, c_noise, c, **extra):
        xin = jnp.concatenate([x, c["concat"]], axis=-1)
        return model.apply({"params": params}, xin, c_noise, c["crossattn"],
                           c["vector"], num_video_frames=T,
                           image_only_indicator=jnp.asarray(ioi2))

    def denoise_fn(x, sigma, c):
        return denoiser(network, x, sigma, c)

    z = jax.jit(lambda n: sampler(denoise_fn, n, cond_j, uc_j,
                                  key=jax.random.PRNGKey(0)))(nhwc(noise))
    z = np.moveaxis(np.asarray(z), -1, 1)
    assert np.abs(z_ref).max() > 1e-2
    np.testing.assert_allclose(z, z_ref, rtol=5e-3, atol=5e-3)

    dec = VideoDecoder(**{k: v for k, v in TINY_DD.items()
                          if k != "attn_type"}, video_kernel_size=[3, 1, 1])
    dtemplate = jax.eval_shape(
        lambda: dec.init(jax.random.PRNGKey(0), jnp.zeros((T, H, W, 4)),
                         timesteps=T))["params"]
    dparams, dmissing, _ = convert_state_dict_to_params(dec_sd, dtemplate)
    assert dmissing == []
    video = jax.jit(lambda z: dec.apply({"params": dparams}, z, timesteps=T))(
        nhwc(z_ref / 0.18215))
    video = np.moveaxis(np.asarray(video), -1, 1)
    np.testing.assert_allclose(video, video_ref, rtol=5e-3, atol=5e-3)
