"""GroupNorm statistics kernel (ops/fused_norm.py group_stats_pallas).

Numerics run in pallas interpret mode on the CPU backend; the TPU win it
exists for (keeping GN-stat reduces out of conv fusions) is measured by
bench.py, not here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcd_tpu.ops import fused_norm
from gcd_tpu.ops.dispatch import kernel_flags


@pytest.fixture(autouse=True)
def interpret_mode():
    fused_norm._INTERPRET = True
    yield
    fused_norm._INTERPRET = False


def _ref_stats(x, g):
    n, hw, c = x.shape
    xf = np.asarray(x, np.float32).reshape(n, hw, g, c // g)
    return xf.sum((1, 3)), (xf * xf).sum((1, 3))


@pytest.mark.parametrize("shape,g", [((3, 96, 64), 32), ((2, 48, 128), 16)])
def test_stats_match_reduce(shape, g):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    s1, s2 = fused_norm.group_stats_pallas(x, g)
    r1, r2 = _ref_stats(x, g)
    assert s1.shape == (shape[0], g) and s1.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(s1), r1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), r2, rtol=1e-5, atol=1e-4)


def test_stats_tiled_accumulation():
    """hw large enough to need several spatial tiles."""
    hw = 4096
    x = jax.random.normal(jax.random.PRNGKey(1), (1, hw, 256), jnp.bfloat16)
    tile = fused_norm._pick_stats_tile(hw, 256, budget=512 * 1024)
    assert tile is not None and tile < hw and hw % tile == 0
    old = fused_norm.VMEM_BUDGET_BYTES
    fused_norm.VMEM_BUDGET_BYTES = 512 * 1024
    try:
        s1, s2 = fused_norm.group_stats_pallas(x, 32)
    finally:
        fused_norm.VMEM_BUDGET_BYTES = old
    r1, r2 = _ref_stats(x, 32)
    np.testing.assert_allclose(np.asarray(s1), r1, rtol=1e-5, atol=3e-3)
    np.testing.assert_allclose(np.asarray(s2), r2, rtol=1e-5, atol=3e-3)


def test_stats_grad_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64), jnp.float32)

    def loss_pallas(x):
        s1, s2 = fused_norm.group_stats_pallas(x, 8)
        return (s1 * 0.5 + s2 * 0.25).sum()

    def loss_ref(x):
        xf = x.reshape(2, 64, 8, 8)
        s1 = xf.sum((1, 3))
        s2 = (xf * xf).sum((1, 3))
        return (s1 * 0.5 + s2 * 0.25).sum()

    g_pallas = jax.grad(loss_pallas)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_groupnorm_with_pallas_stats_matches_plain():
    """The full GN path under the gn_stats_pallas flag vs the default.

    _is_tpu_backend() is False on CPU, so route around the gate and call the
    underlying formula with pallas stats by monkeypatching."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 64), jnp.float32)
    scale = jnp.linspace(0.5, 1.5, 64)
    bias = jnp.linspace(-0.2, 0.2, 64)

    base = fused_norm._reference_groupnorm(x, scale, bias, 32, 1e-5, True)

    import gcd_tpu.ops.attention as attn_mod

    orig = attn_mod._is_tpu_backend
    attn_mod._is_tpu_backend = lambda: True
    try:
        with kernel_flags(gn_stats_pallas=True):
            out = fused_norm._reference_groupnorm(x, scale, bias, 32, 1e-5,
                                                  True)
    finally:
        attn_mod._is_tpu_backend = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=2e-5,
                               atol=2e-5)
