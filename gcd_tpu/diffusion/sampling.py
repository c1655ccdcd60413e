"""Diffusion samplers as single jitted `lax.scan` loops over the sigma ladder.

Behavioral reference: gcd-model/sgm/modules/diffusionmodules/sampling.py (+
sampling_utils.py). The production sampler for all released GCD models is
`EulerEDMSampler` with 25 steps over an EDMDiscretization(sigma_max=700) ladder
(train_kubric_max90.yaml:124-139).

TPU-first design choices vs the reference's python loop:
  * the sigma ladder is static (numpy at setup), so per-step scalars that the
    reference computes with python conditionals (e.g. the churn `gamma`) are
    precomputed into scan inputs;
  * the CFG doubled batch (uc first, then c) rides through the scan as a single
    (2·B·T, H, W, C) tensor so XLA sees one fused 25-iteration loop;
  * all samplers share the convention `denoiser(x, sigma, cond) -> denoised` where
    the engine has already bound network params and additional model inputs.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from gcd_tpu.utils.config import register, instantiate_from_config
from gcd_tpu.utils.misc import append_dims, default

DEFAULT_GUIDER = {"target": "sgm.modules.diffusionmodules.guiders.IdentityGuider"}

DenoiserFn = Callable[[jnp.ndarray, jnp.ndarray, Dict], jnp.ndarray]


def to_d(x: jnp.ndarray, sigma: jnp.ndarray, denoised: jnp.ndarray) -> jnp.ndarray:
    """ODE derivative (sampling_utils.py:33)."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from, sigma_to, eta=1.0):
    """(sampling_utils.py:22) — returns (sigma_down, sigma_up)."""
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


class BaseDiffusionSampler:
    def __init__(
        self,
        discretization_config: Dict,
        num_steps: Optional[int] = None,
        guider_config: Optional[Dict] = None,
        verbose: bool = False,
        device: Optional[str] = None,  # accepted for config parity; unused on TPU
        guidance_interval: Optional[tuple] = None,
    ):
        """guidance_interval=(lo, hi): opt-in inference accelerator — apply
        CFG only when sigma is inside [lo, hi] and run the bare conditional
        branch (half the UNet batch, ~2x cheaper per step) outside it
        (Kynkaanniemi et al. 2024, "Applying Guidance in a Limited Interval",
        arXiv:2404.07724: guidance mostly matters at mid-range noise levels).
        None (default) = exact CFG at every step, the reference protocol
        (sgm/modules/diffusionmodules/sampling.py:101-121)."""
        self.num_steps = num_steps
        self.discretization = instantiate_from_config(discretization_config)
        self.guider = instantiate_from_config(default(guider_config, DEFAULT_GUIDER))
        self.verbose = verbose
        self.guidance_interval = (
            tuple(float(v) for v in guidance_interval)
            if guidance_interval is not None else None)

    def get_sigmas_np(self, num_steps: Optional[int]) -> np.ndarray:
        n = self.num_steps if num_steps is None else num_steps
        assert n is not None, "num_steps must be set on the sampler or passed in"
        return np.asarray(self.discretization(n, do_append_zero=True))

    def prepare_sampling_loop(self, x, cond, uc=None, num_steps=None):
        sigmas = self.get_sigmas_np(num_steps)
        uc = default(uc, cond)
        # Initial input scale — sampling.py:54. With sigma_max=700 this is ~sigma_max.
        x = x * float(np.sqrt(1.0 + sigmas[0] ** 2))
        s_in = jnp.ones((x.shape[0],), dtype=jnp.float32)
        return x, s_in, sigmas, len(sigmas), cond, uc

    def denoise(self, x, denoiser: DenoiserFn, sigma, cond, uc):
        def guided(x):
            x_in, s_in, c_in = self.guider.prepare_inputs(x, sigma, cond, uc)
            return self.guider(denoiser(x_in, s_in, c_in), sigma)

        if self.guidance_interval is None:
            return guided(x)

        # Outside [lo, hi]: bare conditional evaluation — the same result the
        # guided path converges to at scale->1, at half the UNet batch. Both
        # branches produce (B*T, ...) so lax.cond picks one at runtime inside
        # the compiled scan.
        lo, hi = self.guidance_interval

        def plain(x):
            return denoiser(x, sigma, cond)

        s0 = sigma.reshape(-1)[0]  # sigma is uniform across the batch
        return jax.lax.cond((s0 >= lo) & (s0 <= hi), guided, plain, x)


class SingleStepDiffusionSampler(BaseDiffusionSampler):
    def euler_step(self, x, d, dt):
        return x + dt * d


@register("sgm.modules.diffusionmodules.sampling.EDMSampler")
class EDMSampler(SingleStepDiffusionSampler):
    """Euler with optional churn; scan-compiled."""

    def __init__(self, s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.s_churn = float(s_churn)
        self.s_tmin = float(s_tmin)
        self.s_tmax = float(s_tmax)
        self.s_noise = float(s_noise)

    def _gammas(self, sigmas: np.ndarray) -> np.ndarray:
        num_sigmas = len(sigmas)
        gammas = np.zeros(num_sigmas - 1, dtype=np.float32)
        for i in range(num_sigmas - 1):
            if self.s_tmin <= sigmas[i] <= self.s_tmax:
                gammas[i] = min(self.s_churn / (num_sigmas - 1), 2**0.5 - 1)
        return gammas

    def possible_correction_step(self, euler_step, x, d, dt, next_sigma, denoiser, cond, uc):
        return euler_step

    def sampler_step(self, sigma, next_sigma, denoiser, x, cond, uc, gamma, key):
        sigma_hat = sigma * (gamma + 1.0)
        if self.s_churn > 0.0:
            eps = jax.random.normal(key, x.shape, dtype=x.dtype) * self.s_noise
            bump = append_dims(jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)), x.ndim)
            x = x + eps * bump
        denoised = self.denoise(x, denoiser, sigma_hat, cond, uc)
        d = to_d(x, sigma_hat, denoised)
        dt = append_dims(next_sigma - sigma_hat, x.ndim)
        euler_step = self.euler_step(x, d, dt)
        return self.possible_correction_step(euler_step, x, d, dt, next_sigma, denoiser, cond, uc)

    def __call__(self, denoiser: DenoiserFn, x, cond, uc=None, num_steps=None,
                 key: Optional[jax.Array] = None):
        x, s_in, sigmas_np, num_sigmas, cond, uc = self.prepare_sampling_loop(
            x, cond, uc, num_steps
        )
        gammas = jnp.asarray(self._gammas(sigmas_np))
        sig = jnp.asarray(sigmas_np[:-1])
        sig_next = jnp.asarray(sigmas_np[1:])
        key = default(key, jax.random.PRNGKey(0))
        step_keys = jax.random.split(key, num_sigmas - 1)

        def body(carry, inp):
            x = carry
            sigma_i, sigma_n, gamma_i, k_i = inp
            x = self.sampler_step(
                s_in * sigma_i, s_in * sigma_n, denoiser, x, cond, uc, gamma_i, k_i
            )
            return x, None

        x, _ = jax.lax.scan(body, x, (sig, sig_next, gammas, step_keys))
        return x


@register("sgm.modules.diffusionmodules.sampling.EulerEDMSampler")
class EulerEDMSampler(EDMSampler):
    """Plain Euler — the sampler used by all released GCD checkpoints."""


@register("sgm.modules.diffusionmodules.sampling.HeunEDMSampler")
class HeunEDMSampler(EDMSampler):
    def possible_correction_step(self, euler_step, x, d, dt, next_sigma, denoiser, cond, uc):
        def correct(es):
            denoised = self.denoise(es, denoiser, next_sigma, cond, uc)
            d_new = to_d(es, next_sigma, denoised)
            d_prime = (d + d_new) / 2.0
            return x + d_prime * dt

        # next_sigma is uniform across the batch; second-order correction is skipped
        # on the final step to sigma=0 (sampling.py:243-249).
        do_correct = next_sigma[0] > 1e-14
        return jax.lax.cond(do_correct, correct, lambda es: es, euler_step)


class AncestralSampler(SingleStepDiffusionSampler):
    def __init__(self, eta=1.0, s_noise=1.0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.eta = float(eta)
        self.s_noise = float(s_noise)

    def ancestral_euler_step(self, x, denoised, sigma, sigma_down):
        d = to_d(x, sigma, denoised)
        dt = append_dims(sigma_down - sigma, x.ndim)
        return self.euler_step(x, d, dt)

    def ancestral_step(self, x, sigma, next_sigma, sigma_up, key):
        noise = jax.random.normal(key, x.shape, dtype=x.dtype) * self.s_noise
        x_new = x + noise * append_dims(sigma_up, x.ndim)
        mask = append_dims(next_sigma, x.ndim) > 0.0
        return jnp.where(mask, x_new, x)

    def sampler_step(self, sigma, next_sigma, denoiser, x, cond, uc, key):
        raise NotImplementedError

    def __call__(self, denoiser: DenoiserFn, x, cond, uc=None, num_steps=None,
                 key: Optional[jax.Array] = None):
        x, s_in, sigmas_np, num_sigmas, cond, uc = self.prepare_sampling_loop(
            x, cond, uc, num_steps
        )
        sig = jnp.asarray(sigmas_np[:-1])
        sig_next = jnp.asarray(sigmas_np[1:])
        key = default(key, jax.random.PRNGKey(0))
        step_keys = jax.random.split(key, num_sigmas - 1)

        def body(carry, inp):
            x = carry
            sigma_i, sigma_n, k_i = inp
            x = self.sampler_step(s_in * sigma_i, s_in * sigma_n, denoiser, x, cond, uc, k_i)
            return x, None

        x, _ = jax.lax.scan(body, x, (sig, sig_next, step_keys))
        return x


@register("sgm.modules.diffusionmodules.sampling.EulerAncestralSampler")
class EulerAncestralSampler(AncestralSampler):
    def sampler_step(self, sigma, next_sigma, denoiser, x, cond, uc, key):
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
        denoised = self.denoise(x, denoiser, sigma, cond, uc)
        x = self.ancestral_euler_step(x, denoised, sigma, sigma_down)
        x = self.ancestral_step(x, sigma, next_sigma, sigma_up, key)
        return x


@register("sgm.modules.diffusionmodules.sampling.DPMPP2SAncestralSampler")
class DPMPP2SAncestralSampler(AncestralSampler):
    def get_variables(self, sigma, sigma_down):
        t, t_next = (-jnp.log(sigma), -jnp.log(sigma_down))
        h = t_next - t
        s = t + 0.5 * h
        return h, s, t, t_next

    def get_mult(self, h, s, t, t_next):
        mult1 = jnp.exp(-s) / jnp.exp(-t)
        mult2 = jnp.expm1(-0.5 * h)
        mult3 = jnp.exp(-t_next) / jnp.exp(-t)
        mult4 = jnp.expm1(-h)
        return mult1, mult2, mult3, mult4

    def sampler_step(self, sigma, next_sigma, denoiser, x, cond, uc, key):
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
        denoised = self.denoise(x, denoiser, sigma, cond, uc)

        def euler_only(args):
            x, denoised = args
            return self.ancestral_euler_step(x, denoised, sigma, sigma_down)

        def dpmpp_2s(args):
            x, denoised = args
            sd = jnp.maximum(sigma_down, 1e-10)
            h, s, t, t_next = self.get_variables(sigma, sd)
            mult1, mult2, mult3, mult4 = [
                append_dims(m, x.ndim) for m in self.get_mult(h, s, t, t_next)
            ]
            x2 = mult1 * x - mult2 * denoised
            denoised2 = self.denoise(x2, denoiser, jnp.exp(-s), cond, uc)
            return mult3 * x - mult4 * denoised2

        # sigma_down == 0 only on the final step (uniform over batch).
        x = jax.lax.cond(sigma_down[0] < 1e-14, euler_only, dpmpp_2s, (x, denoised))
        x = self.ancestral_step(x, sigma, next_sigma, sigma_up, key)
        return x


@register("sgm.modules.diffusionmodules.sampling.DPMPP2MSampler")
class DPMPP2MSampler(BaseDiffusionSampler):
    def get_variables(self, sigma, next_sigma, previous_sigma):
        t, t_next = (-jnp.log(sigma), -jnp.log(next_sigma))
        h = t_next - t
        t_prev = -jnp.log(previous_sigma)
        h_last = t - t_prev
        r = h_last / h
        return h, r, t, t_next

    def get_mult(self, h, r, t, t_next):
        mult1 = jnp.exp(-t_next) / jnp.exp(-t)
        mult2 = jnp.expm1(-h)
        mult3 = 1.0 + 1.0 / (2.0 * r)
        mult4 = 1.0 / (2.0 * r)
        return mult1, mult2, mult3, mult4

    def __call__(self, denoiser: DenoiserFn, x, cond, uc=None, num_steps=None,
                 key: Optional[jax.Array] = None):
        x, s_in, sigmas_np, num_sigmas, cond, uc = self.prepare_sampling_loop(
            x, cond, uc, num_steps
        )
        sig = jnp.asarray(sigmas_np[:-1])
        sig_next = jnp.asarray(sigmas_np[1:])
        sig_prev = jnp.asarray(np.concatenate([sigmas_np[:1], sigmas_np[:-2]]))
        is_first = jnp.asarray(
            np.arange(num_sigmas - 1) == 0, dtype=jnp.bool_
        )

        def body(carry, inp):
            x, old_denoised = carry
            sigma_i, sigma_n, sigma_p, first = inp
            sigma = s_in * sigma_i
            next_sigma = s_in * sigma_n
            prev_sigma = s_in * sigma_p

            denoised = self.denoise(x, denoiser, sigma, cond, uc)
            sn = jnp.maximum(next_sigma, 1e-10)
            h, r, t, t_next = self.get_variables(sigma, sn, prev_sigma)
            mult1, mult2, mult3, mult4 = [
                append_dims(m, x.ndim) for m in self.get_mult(h, r, t, t_next)
            ]
            x_standard = mult1 * x - mult2 * denoised
            denoised_d = mult3 * denoised - mult4 * old_denoised
            x_advanced = mult1 * x - mult2 * denoised_d

            use_standard = jnp.logical_or(first, next_sigma[0] < 1e-14)
            x_new = jnp.where(use_standard, x_standard, x_advanced)
            return (x_new, denoised), None

        (x, _), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x)), (sig, sig_next, sig_prev, is_first)
        )
        return x


@register("sgm.modules.diffusionmodules.sampling.LinearMultistepSampler")
class LinearMultistepSampler(BaseDiffusionSampler):
    """LMS with static coefficients precomputed from the (static) sigma ladder."""

    def __init__(self, order: int = 4, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.order = int(order)

    @staticmethod
    def _lms_coeff(order, t, i, j):
        from scipy import integrate

        def fn(tau):
            prod = 1.0
            for k in range(order):
                if j == k:
                    continue
                prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
            return prod

        return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]

    def __call__(self, denoiser: DenoiserFn, x, cond, uc=None, num_steps=None,
                 key: Optional[jax.Array] = None):
        x, s_in, sigmas_np, num_sigmas, cond, uc = self.prepare_sampling_loop(
            x, cond, uc, num_steps
        )
        n = num_sigmas - 1
        # Static coefficient table: coeffs[i, j] weights d_{i-j} at step i.
        coeffs = np.zeros((n, self.order), dtype=np.float32)
        for i in range(n):
            cur_order = min(i + 1, self.order)
            for j in range(cur_order):
                coeffs[i, j] = self._lms_coeff(cur_order, sigmas_np, i, j)
        coeffs = jnp.asarray(coeffs)
        sig = jnp.asarray(sigmas_np[:-1])

        ds0 = jnp.zeros((self.order,) + x.shape, dtype=x.dtype)

        def body(carry, inp):
            x, ds = carry
            sigma_i, coeff_i = inp
            sigma = s_in * sigma_i
            denoised = self.denoise(x, denoiser, sigma, cond, uc)
            d = to_d(x, sigma, denoised)
            # ds[0] is the newest derivative.
            ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
            upd = jnp.tensordot(coeff_i, ds, axes=(0, 0))
            return (x + upd, ds), None

        (x, _), _ = jax.lax.scan(body, (x, ds0), (sig, coeffs))
        return x
