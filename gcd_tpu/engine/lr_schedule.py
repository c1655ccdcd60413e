"""LR schedules (reference: gcd-model/sgm/lr_scheduler.py).

All return multiplier-of-base-LR callables (step -> float), matching the
reference's LambdaLR usage (diffusion.py:420-430). Shipped GCD configs use a
constant Adam 2e-5 (no scheduler), but the API surface is kept.
"""

from __future__ import annotations

import numpy as np

from gcd_tpu.utils.config import register

# Each scheduler also provides `schedule_jnp(n)` — the same formula in jnp
# ops on a traced step counter, so the schedule can live INSIDE the jitted
# train step as an optax schedule (the python `schedule` uses data-dependent
# control flow and only works on concrete ints).


@register("sgm.lr_scheduler.LambdaWarmUpCosineScheduler")
class LambdaWarmUpCosineScheduler:
    def __init__(self, warm_up_steps, lr_min, lr_max, lr_start, max_decay_steps,
                 verbosity_interval=0):
        self.lr_warm_up_steps = warm_up_steps
        self.lr_start = lr_start
        self.lr_min = lr_min
        self.lr_max = lr_max
        self.lr_max_decay_steps = max_decay_steps
        self.last_lr = 0.0

    def schedule(self, n):
        if n < self.lr_warm_up_steps:
            lr = (self.lr_max - self.lr_start) / self.lr_warm_up_steps * n + self.lr_start
        else:
            t = (n - self.lr_warm_up_steps) / (self.lr_max_decay_steps - self.lr_warm_up_steps)
            t = min(t, 1.0)
            lr = self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (
                1 + np.cos(t * np.pi)
            )
        self.last_lr = lr
        return lr

    def schedule_jnp(self, n):
        import jax.numpy as jnp

        n = jnp.asarray(n, jnp.float32)
        warm = (self.lr_max - self.lr_start) / self.lr_warm_up_steps * n \
            + self.lr_start
        t = jnp.minimum(
            (n - self.lr_warm_up_steps)
            / (self.lr_max_decay_steps - self.lr_warm_up_steps), 1.0)
        decay = self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (
            1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < self.lr_warm_up_steps, warm, decay)

    def __call__(self, n):
        return self.schedule(n)


@register("sgm.lr_scheduler.LambdaWarmUpCosineScheduler2")
class LambdaWarmUpCosineScheduler2:
    """Cosine with cycles (lr_scheduler.py:51)."""

    def __init__(self, warm_up_steps, f_min, f_max, f_start, cycle_lengths,
                 verbosity_interval=0):
        assert (
            len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start)
            == len(cycle_lengths)
        )
        self.lr_warm_up_steps = warm_up_steps
        self.f_start = f_start
        self.f_min = f_min
        self.f_max = f_max
        self.cycle_lengths = cycle_lengths
        self.cum_cycles = np.cumsum([0] + list(self.cycle_lengths))
        self.last_f = 0.0

    def find_in_interval(self, n):
        interval = 0
        for cl in self.cum_cycles[1:]:
            if n <= cl:
                return interval
            interval += 1
        return interval

    def schedule(self, n):
        cycle = self.find_in_interval(n)
        n = n - self.cum_cycles[cycle]
        if n < self.lr_warm_up_steps[cycle]:
            f = (self.f_max[cycle] - self.f_start[cycle]) / self.lr_warm_up_steps[
                cycle
            ] * n + self.f_start[cycle]
        else:
            t = (n - self.lr_warm_up_steps[cycle]) / (
                self.cycle_lengths[cycle] - self.lr_warm_up_steps[cycle]
            )
            t = min(t, 1.0)
            f = self.f_min[cycle] + 0.5 * (self.f_max[cycle] - self.f_min[cycle]) * (
                1 + np.cos(t * np.pi)
            )
        self.last_f = f
        return f

    def _cycle_arrays(self):
        import jax.numpy as jnp

        return (
            jnp.asarray(self.cum_cycles[:-1], jnp.float32),
            jnp.asarray(self.lr_warm_up_steps, jnp.float32),
            jnp.asarray(self.f_start, jnp.float32),
            jnp.asarray(self.f_min, jnp.float32),
            jnp.asarray(self.f_max, jnp.float32),
            jnp.asarray(self.cycle_lengths, jnp.float32),
        )

    def _find_cycle_jnp(self, n):
        import jax.numpy as jnp

        # find_in_interval: first i with n <= cum_cycles[i+1], clamped to the
        # last cycle for n beyond the final boundary.
        bounds = jnp.asarray(self.cum_cycles[1:], jnp.float32)
        idx = jnp.searchsorted(bounds, n, side="left")
        return jnp.minimum(idx, len(self.cycle_lengths) - 1)

    def schedule_jnp(self, n):
        import jax.numpy as jnp

        n = jnp.asarray(n, jnp.float32)
        cum, warm, f_start, f_min, f_max, cyc_len = self._cycle_arrays()
        c = self._find_cycle_jnp(n)
        nc = n - cum[c]
        rise = (f_max[c] - f_start[c]) / warm[c] * nc + f_start[c]
        t = jnp.minimum((nc - warm[c]) / (cyc_len[c] - warm[c]), 1.0)
        decay = f_min[c] + 0.5 * (f_max[c] - f_min[c]) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(nc < warm[c], rise, decay)

    def __call__(self, n):
        return self.schedule(n)


@register("sgm.lr_scheduler.LambdaLinearScheduler")
class LambdaLinearScheduler(LambdaWarmUpCosineScheduler2):
    def schedule(self, n):
        cycle = self.find_in_interval(n)
        n = n - self.cum_cycles[cycle]
        if n < self.lr_warm_up_steps[cycle]:
            f = (self.f_max[cycle] - self.f_start[cycle]) / self.lr_warm_up_steps[
                cycle
            ] * n + self.f_start[cycle]
        else:
            f = self.f_min[cycle] + (self.f_max[cycle] - self.f_min[cycle]) * (
                self.cycle_lengths[cycle] - n
            ) / (self.cycle_lengths[cycle])
        self.last_f = f
        return f

    def schedule_jnp(self, n):
        import jax.numpy as jnp

        n = jnp.asarray(n, jnp.float32)
        cum, warm, f_start, f_min, f_max, cyc_len = self._cycle_arrays()
        c = self._find_cycle_jnp(n)
        nc = n - cum[c]
        rise = (f_max[c] - f_start[c]) / warm[c] * nc + f_start[c]
        lin = f_min[c] + (f_max[c] - f_min[c]) * (cyc_len[c] - nc) / cyc_len[c]
        return jnp.where(nc < warm[c], rise, lin)
