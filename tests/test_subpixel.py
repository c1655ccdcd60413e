"""Subpixel fused upsample (ops/subpixel.py): exactness vs the naive
nearest-2x + 3x3-conv formulation, module-level flag A/B, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcd_tpu.ops.dispatch import kernel_flags
from gcd_tpu.ops.subpixel import fold_upsample_kernel, upsample2x_conv3x3
from gcd_tpu.ops.basic import nearest_upsample_2x


def naive(x, kernel, bias):
    up = nearest_upsample_2x(x)
    y = jax.lax.conv_general_dilated(
        up, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


@pytest.mark.parametrize("shape,cout", [
    ((2, 5, 7, 8), 8),
    ((1, 8, 12, 16), 24),
    ((3, 1, 1, 4), 4),
])
def test_fused_matches_naive(rng, shape, cout):
    cin = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    got = jax.jit(upsample2x_conv3x3)(x, k, b)
    want = jax.jit(naive)(x, k, b)
    assert got.shape == want.shape == (shape[0], 2 * shape[1], 2 * shape[2], cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fold_kernel_shape(rng):
    k = jnp.asarray(rng.standard_normal((3, 3, 6, 10)), jnp.float32)
    k4 = fold_upsample_kernel(k)
    assert k4.shape == (2, 2, 6, 40)
    # phase (0,0) kernel: rows (k0, k1+k2) folded along both axes
    np.testing.assert_allclose(np.asarray(k4[0, 0, :, :10]),
                               np.asarray(k[0, 0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(k4[1, 1, :, :10]),
        np.asarray(k[1, 1] + k[1, 2] + k[2, 1] + k[2, 2]),
        rtol=1e-5, atol=1e-6)


def test_gradients_match(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    g_fused = jax.grad(lambda *a: upsample2x_conv3x3(*a).sum(), argnums=(0, 1))(x, k, b)
    g_naive = jax.grad(lambda *a: naive(*a).sum(), argnums=(0, 1))(x, k, b)
    for gf, gn in zip(g_fused, g_naive):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gn),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("module", ["unet", "vae"])
def test_upsample_module_flag_ab(rng, module):
    if module == "unet":
        from gcd_tpu.models.resblock import Upsample
        mod = Upsample()
    else:
        from gcd_tpu.models.vae import Upsample
        mod = Upsample()
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 16)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    # same params drive both paths; outputs must agree
    with kernel_flags(subpix_upsample=False):
        base = jax.jit(mod.apply)(params, x)
    with kernel_flags(subpix_upsample=True):
        fused = jax.jit(mod.apply)(params, x)
    assert base.shape == fused.shape == (2, 12, 16, 16)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
    # checkpoint key map unchanged: nn.Conv-style names
    assert "kernel" in params["params"]["conv"]
    assert params["params"]["conv"]["kernel"].shape == (3, 3, 16, 16)
