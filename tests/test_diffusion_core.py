"""Unit tests for gcd_tpu.diffusion: scalings, ladders, denoiser, guiders, samplers, loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcd_tpu.diffusion import (
    EDMDiscretization,
    LegacyDDPMDiscretization,
    EDMSampling,
    EDMWeighting,
    VScalingWithEDMcNoise,
    EpsScaling,
    Denoiser,
    LinearPredictionGuider,
    VanillaCFG,
    EulerEDMSampler,
    HeunEDMSampler,
    EulerAncestralSampler,
    DPMPP2SAncestralSampler,
    DPMPP2MSampler,
    LinearMultistepSampler,
    StandardDiffusionLoss,
)
from gcd_tpu.utils.config import instantiate_from_config


def test_edm_discretization_ladder():
    disc = EDMDiscretization(sigma_max=700.0)
    sigmas = np.asarray(disc(25, do_append_zero=True))
    assert sigmas.shape == (26,)
    assert sigmas[0] == pytest.approx(700.0, rel=1e-5)
    assert sigmas[-1] == 0.0
    assert np.all(np.diff(sigmas) < 0)
    # Karras formula spot check at i=12.
    rho = 7.0
    ramp = 12 / 24
    expected = (700 ** (1 / rho) + ramp * (0.002 ** (1 / rho) - 700 ** (1 / rho))) ** rho
    assert sigmas[12] == pytest.approx(expected, rel=1e-4)


def test_legacy_ddpm_discretization():
    disc = LegacyDDPMDiscretization()
    sigmas = np.asarray(disc(1000, do_append_zero=False))
    assert sigmas.shape == (1000,)
    assert np.all(np.diff(sigmas) < 0)  # descending
    sub = np.asarray(disc(50, do_append_zero=True))
    assert sub.shape == (51,)


def test_vscaling_edm_cnoise():
    sigma = jnp.asarray([0.5, 1.0, 2.0])
    c_skip, c_out, c_in, c_noise = VScalingWithEDMcNoise()(sigma)
    np.testing.assert_allclose(c_skip, 1 / (sigma**2 + 1), rtol=1e-6)
    np.testing.assert_allclose(c_out, -sigma / jnp.sqrt(sigma**2 + 1), rtol=1e-6)
    np.testing.assert_allclose(c_in, 1 / jnp.sqrt(sigma**2 + 1), rtol=1e-6)
    np.testing.assert_allclose(c_noise, 0.25 * jnp.log(sigma), rtol=1e-6)


def test_denoiser_formula():
    den = Denoiser({"target": "sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling"})
    x = jnp.ones((2, 4, 4, 3))
    sigma = jnp.asarray([1.0, 2.0])

    def network(xs, c_noise, cond):
        assert c_noise.shape == (2,)
        return xs * 2.0

    out = den(network, x, sigma, {})
    # EpsScaling: c_skip=1, c_out=-sigma, c_in=1/sqrt(sigma^2+1)
    c_in = 1 / np.sqrt(np.asarray([1.0, 2.0])[:, None, None, None] ** 2 + 1)
    expected = (np.asarray(x) * c_in * 2.0) * -np.asarray([1.0, 2.0])[:, None, None, None] + x
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_linear_prediction_guider():
    t = 4
    g = LinearPredictionGuider(max_scale=2.5, num_frames=t, min_scale=1.0)
    uc = jnp.zeros((1 * t, 2, 2, 1))
    c = jnp.ones((1 * t, 2, 2, 1))
    x = jnp.concatenate([uc, c], axis=0)
    out = np.asarray(g(x, sigma=None))
    scales = np.linspace(1.0, 2.5, t)
    # out = uc + scale*(c - uc) = scale per frame
    np.testing.assert_allclose(out[:, 0, 0, 0], scales, rtol=1e-6)


def test_guider_prepare_inputs_uc_first():
    g = VanillaCFG(scale=2.0)
    c = {"vector": jnp.ones((2, 3)), "crossattn": jnp.ones((2, 1, 4)), "concat": jnp.ones((2, 2, 2, 1))}
    uc = {k: v * 0 for k, v in c.items()}
    x = jnp.ones((2, 2, 2, 1))
    s = jnp.ones((2,))
    x2, s2, c2 = g.prepare_inputs(x, s, c, uc)
    assert x2.shape[0] == 4 and s2.shape[0] == 4
    # uc occupies the first half (guiders.py:96 convention)
    np.testing.assert_allclose(np.asarray(c2["vector"])[:2], 0.0)
    np.testing.assert_allclose(np.asarray(c2["vector"])[2:], 1.0)


def _perfect_denoiser(x0):
    """With a delta data distribution at x0, the optimal denoiser returns x0."""

    def denoiser(x, sigma, cond):
        return jnp.broadcast_to(x0, x.shape)

    return denoiser


SAMPLERS = [
    EulerEDMSampler,
    HeunEDMSampler,
    EulerAncestralSampler,
    DPMPP2SAncestralSampler,
    DPMPP2MSampler,
    LinearMultistepSampler,
]


@pytest.mark.parametrize("sampler_cls", SAMPLERS)
def test_samplers_converge_with_perfect_denoiser(sampler_cls, key):
    disc_cfg = {
        "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
        "params": {"sigma_max": 80.0},
    }
    sampler = sampler_cls(num_steps=20, discretization_config=disc_cfg)
    x0 = jnp.full((2, 4, 4, 1), 3.5)
    noise = jax.random.normal(key, x0.shape)
    out = sampler(_perfect_denoiser(x0), noise, cond={}, uc=None, key=key)
    # Any consistent ODE/SDE sampler must land exactly on x0 at sigma=0 for a
    # perfect denoiser whose prediction is constant in x.
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=2e-2, atol=2e-2)


def test_guidance_interval(key):
    """guidance_interval: full-coverage interval must be bit-identical to
    the default exact-CFG path; an empty interval must equal bare
    conditional sampling (the lax.cond 'plain' branch everywhere)."""
    disc_cfg = {
        "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
        "params": {"sigma_max": 700.0},
    }
    guider_cfg = {
        "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
        "params": {"num_frames": 2, "max_scale": 1.5, "min_scale": 1.0},
    }

    def denoiser(x, sigma, cond):
        return x * 0.5 + cond["vector"].mean()

    cond = {"vector": jnp.ones((2, 3))}
    uc = {"vector": jnp.zeros((2, 3))}
    noise = jax.random.normal(key, (2, 4, 4, 1))

    def run(**kw):
        sampler = EulerEDMSampler(num_steps=5, discretization_config=disc_cfg,
                                  **kw)
        return np.asarray(jax.jit(
            lambda n: sampler(denoiser, n, cond, uc, key=key))(noise))

    exact = run(guider_config=guider_cfg)
    always = run(guider_config=guider_cfg, guidance_interval=(0.0, 1e9))
    never = run(guider_config=guider_cfg, guidance_interval=(-2.0, -1.0))
    plain = run()  # IdentityGuider: bare conditional evaluation
    np.testing.assert_array_equal(always, exact)
    np.testing.assert_allclose(never, plain, rtol=1e-6, atol=1e-6)
    assert not np.allclose(never, exact)


def test_euler_sampler_gaussian_flow(key):
    """For x ~ N(0, I), D(x, sigma) = x/(1+sigma^2); the PF-ODE contracts the
    initial noise at sqrt(1+sigma_max^2) back to the unit sphere."""

    def denoiser(x, sigma, cond):
        s = sigma[:, None, None, None]
        return x / (1 + s**2)

    disc_cfg = {
        "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
        "params": {"sigma_max": 80.0, "sigma_min": 0.002},
    }
    sampler = EulerEDMSampler(num_steps=200, discretization_config=disc_cfg)
    z = jax.random.normal(key, (4, 8, 8, 1))
    out = sampler(denoiser, z, cond={}, uc=None, key=key)
    # Solution of the ODE: x(sigma) = z * sqrt(1+sigma^2)/sqrt(1+sigma_max^2);
    # at sigma=0, x = z (the unit-variance seed) exactly.
    np.testing.assert_allclose(np.asarray(out), np.asarray(z), rtol=0.05, atol=0.05)


def test_sampler_is_jittable(key):
    disc_cfg = {
        "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
        "params": {"sigma_max": 700.0},
    }
    guider_cfg = {
        "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
        "params": {"num_frames": 2, "max_scale": 1.5, "min_scale": 1.0},
    }
    sampler = EulerEDMSampler(
        num_steps=5, discretization_config=disc_cfg, guider_config=guider_cfg
    )

    def denoiser(x, sigma, cond):
        return x * 0.5 + cond["vector"].mean()

    cond = {"vector": jnp.ones((2, 3))}
    uc = {"vector": jnp.zeros((2, 3))}

    @jax.jit
    def run(noise):
        return sampler(denoiser, noise, cond, uc, key=key)

    out = run(jax.random.normal(key, (2, 4, 4, 1)))
    assert out.shape == (2, 4, 4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_edm_sigma_sampling_stats(key):
    s = EDMSampling(p_mean=1.0, p_std=1.6)
    sig = np.asarray(s(key, 20000))
    np.testing.assert_allclose(np.log(sig).mean(), 1.0, atol=0.05)
    np.testing.assert_allclose(np.log(sig).std(), 1.6, atol=0.05)


def test_loss_harmonize_and_focal(key):
    loss_cfg = dict(
        sigma_sampler_config={
            "target": "sgm.modules.diffusionmodules.sigma_sampling.EDMSampling",
            "params": {"p_mean": 1.0, "p_std": 1.6},
        },
        loss_weighting_config={
            "target": "sgm.modules.diffusionmodules.loss_weighting.EDMWeighting",
            "params": {"sigma_data": 1.0},
        },
        harmonize_sigmas=True,
        focus_top=0.1,
        focus_steps=100,
        batch2model_keys=["num_video_frames"],
    )
    loss_fn = StandardDiffusionLoss(**loss_cfg)

    b, t, h, w, c = 2, 3, 8, 8, 4
    x = jax.random.normal(key, (b * t, h, w, c))
    batch = {"num_video_frames": t}

    seen_sigmas = {}

    def network(xs, c_noise, cond, **extra):
        # Record sigma harmonization through c_noise (0.25 log sigma per sample).
        seen_sigmas["c_noise"] = c_noise
        assert extra.get("num_video_frames") == t
        return xs * 0.1

    den = Denoiser(
        {"target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"}
    )
    out0 = loss_fn.loss_from_cond(key, network, den, {}, x, batch, global_step=0)
    assert out0.shape == (b * t,)
    cn = np.asarray(seen_sigmas["c_noise"]).reshape(b, t)
    np.testing.assert_allclose(
        cn, np.broadcast_to(cn[:, :1], cn.shape), rtol=1e-6
    )  # harmonized per video

    # Focal annealing: at step >= focus_steps the focal mix is 0.9 top-10% + 0.1 mean.
    model_output = x * 0.0
    target = x
    w = jnp.ones((b * t, 1, 1, 1))
    l_final = np.asarray(
        loss_fn.get_loss(model_output, target, w, batch, global_step=1000)
    )
    flat = np.asarray((x**2)).reshape(b * t, -1)
    n = flat.shape[1]
    keep = int(n * 0.1)
    top = -np.sort(-flat, axis=1)[:, :keep].mean(axis=1)
    expected = 0.9 * top + 0.1 * flat.mean(axis=1)
    np.testing.assert_allclose(l_final, expected, rtol=1e-4)

    # At step 0 the focal term reduces to the plain mean.
    l0 = np.asarray(loss_fn.get_loss(model_output, target, w, batch, global_step=0))
    np.testing.assert_allclose(l0, flat.mean(axis=1), rtol=1e-4)


def test_config_instantiation_via_sgm_alias():
    cfg = {
        "target": "sgm.modules.diffusionmodules.sampling.EulerEDMSampler",
        "params": {
            "num_steps": 25,
            "discretization_config": {
                "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
                "params": {"sigma_max": 700.0},
            },
            "guider_config": {
                "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
                "params": {"num_frames": 14, "max_scale": 2.5, "min_scale": 1.0},
            },
        },
    }
    sampler = instantiate_from_config(cfg)
    assert isinstance(sampler, EulerEDMSampler)
    assert isinstance(sampler.guider, LinearPredictionGuider)
    assert sampler.num_steps == 25
