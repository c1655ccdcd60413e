"""temporal_conv: the im2col-matmul (kt,1,1) conv must match XLA's conv
exactly (same params, same math, different schedule)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcd_tpu.ops.dispatch import kernel_flags
from gcd_tpu.ops.temporal_conv import TemporalConvK11, temporal_conv_k11


@pytest.mark.parametrize("kt", [1, 3, 5])
def test_matmul_path_matches_lax_conv(kt):
    key = jax.random.PRNGKey(0)
    b, t, h, w, c, co = 2, 7, 4, 6, 16, 24
    x = jax.random.normal(key, (b, t, h, w, c))
    mod = TemporalConvK11(features=co, kt=kt)
    params = mod.init(jax.random.PRNGKey(1), x)
    with kernel_flags(tconv_matmul=True):
        got = jax.jit(mod.apply)(params, x)
    with kernel_flags(tconv_matmul=False):
        want = jax.jit(mod.apply)(params, x)
    assert got.shape == (b, t, h, w, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kt", [1, 3, 5])
def test_split_path_matches_lax_conv(kt):
    """The big-shape output-split formulation (one channel-concatenated
    matmul + shifted-add epilogue) is exact vs the lax 3D conv."""
    from gcd_tpu.ops.temporal_conv import temporal_conv_k11_split

    key = jax.random.PRNGKey(2)
    b, t, h, w, c, co = 2, 7, 4, 6, 16, 24
    x = jax.random.normal(key, (b, t, h, w, c))
    kernel = jax.random.normal(jax.random.PRNGKey(3),
                               (kt, 1, 1, c, co)) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(4), (co,))
    want = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1),
        ((kt // 2, (kt - 1) // 2), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    got = jax.jit(temporal_conv_k11_split)(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_split_flag_routes_big_shapes():
    """tconv_split only replaces the lax-conv branch (above the im2col
    threshold); result must stay identical either way."""
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 64, 96, 128))
    mod = TemporalConvK11(features=128, kt=3)
    params = mod.init(jax.random.PRNGKey(6), x)
    with kernel_flags(tconv_split=True):
        got = jax.jit(mod.apply)(params, x)
    with kernel_flags(tconv_split=False):
        want = jax.jit(mod.apply)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_boundary_zero_padding():
    """Tap shifts must zero-pad at the clip boundaries, not wrap."""
    b, t, c = 1, 4, 8
    x = jnp.ones((b, t, 1, 1, c))
    # Kernel that only reads the t-1 tap: output frame 0 must be bias-only.
    kernel = jnp.zeros((3, 1, 1, c, c)).at[0].set(
        jnp.eye(c)[None, None] / c)
    out = temporal_conv_k11(x, kernel, bias=None)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 1]), 1.0 / c * c / c,
                               rtol=1e-6)


def test_param_tree_matches_nn_conv():
    """Drop-in contract: identical param names and shapes to nn.Conv."""
    from flax import linen as nn

    x = jnp.zeros((1, 3, 2, 2, 8))
    a = TemporalConvK11(features=12, kt=3).init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(12, (3, 1, 1),
                  padding=((1, 1), (0, 0), (0, 0))).init(
        jax.random.PRNGKey(0), x)
    sa = jax.tree_util.tree_map(lambda a_: a_.shape, a)
    sb = jax.tree_util.tree_map(lambda a_: a_.shape, ref)
    assert sa == sb
