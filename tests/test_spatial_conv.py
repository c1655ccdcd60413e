"""Spatial 3x3 im2col-matmul conv vs lax conv (ops/spatial_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcd_tpu.ops.dispatch import kernel_flags
from gcd_tpu.ops.spatial_conv import SpatialConv3x3, conv3x3_im2col


def test_im2col_matches_lax_conv():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 12, 16))
    w = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 16, 24)) * 0.1
    b = jax.random.normal(jax.random.fold_in(k, 2), (24,)) * 0.1

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = conv3x3_im2col(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_module_param_tree_and_dispatch():
    x = jnp.zeros((1, 6, 6, 8))
    m = SpatialConv3x3(features=4)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert params["kernel"].shape == (3, 3, 8, 4)
    assert params["bias"].shape == (4,)

    xr = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 6, 8))
    with kernel_flags(sconv_matmul=False):
        a = m.apply({"params": params}, xr)
    with kernel_flags(sconv_matmul=True):
        b = m.apply({"params": params}, xr)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
