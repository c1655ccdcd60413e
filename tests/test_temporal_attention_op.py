"""ops/temporal_attention: transpose-free temporal self-attention.

On TPU the Pallas striped-mask kernel runs; on CPU (this suite) the XLA
fallback runs, and the kernel math is checked in interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gcd_tpu.ops.temporal_attention import (
    _pallas_fwd,
    _xla_temporal,
    temporal_attention,
)


def _make(b=2, t=4, s=16, c=128, heads=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b * t, s, c))
    k = jax.random.normal(ks[1], (b * t, s, c))
    v = jax.random.normal(ks[2], (b * t, s, c))
    return q, k, v


def _reference(q, k, v, t, heads):
    """Direct (B*S, T) attention — the rearrange formulation of
    video_attention.py:114."""
    bt, s, c = q.shape
    b = bt // t
    d = c // heads

    def tm(z):
        return np.asarray(z).reshape(b, t, s, heads, d).transpose(0, 2, 3, 1, 4)

    qh, kh, vh = tm(q), tm(k), tm(v)  # (B, S, H, T, D)
    logits = np.einsum("bshud,bshvd->bshuv", qh, kh) * d**-0.5
    p = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    out = np.einsum("bshuv,bshvd->bshud", p, vh)
    return out.transpose(0, 3, 1, 2, 4).reshape(bt, s, c)


def test_xla_path_matches_reference():
    q, k, v = _make()
    got = _xla_temporal(q, k, v, 4, 2, (128 // 2) ** -0.5)
    np.testing.assert_allclose(np.asarray(got), _reference(q, k, v, 4, 2),
                               atol=1e-4, rtol=1e-4)


def test_pallas_kernel_interpret_matches_xla():
    q, k, v = _make()
    scale = (128 // 2) ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_fwd(q, k, v, 4, 2, scale)
    want = _xla_temporal(q, k, v, 4, 2, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pallas_kernel_interpret_gcd_shape():
    # The flagship UNet's ds1 shape scaled down: T=14 frames, 5 heads of 64.
    q, k, v = _make(b=1, t=14, s=24, c=320, heads=5, seed=1)
    scale = 64.0 ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_fwd(q, k, v, 14, 5, scale)
    want = _xla_temporal(q, k, v, 14, 5, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_entry_point_and_grads():
    q, k, v = _make()

    def loss(q, k, v):
        return jnp.sum(temporal_attention(q, k, v, 4, 2) ** 2)

    val = jax.jit(loss)(q, k, v)
    assert np.isfinite(float(val))
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

def test_pallas_kernel_pack2_matches_xla():
    """Head-pair packed per-pack matmuls (tattn_pack2) must match the XLA
    formulation exactly, including the odd-head leftover path (5 heads)."""
    from gcd_tpu.ops.dispatch import kernel_flags

    for kwargs, t, heads in [
        (dict(b=2, t=4, s=16, c=128, heads=2, seed=2), 4, 2),
        (dict(b=1, t=14, s=24, c=320, heads=5, seed=3), 14, 5),
    ]:
        q, k, v = _make(**kwargs)
        scale = (kwargs["c"] // heads) ** -0.5
        with pltpu.force_tpu_interpret_mode():
            with kernel_flags(tattn_pack2=True):
                got = _pallas_fwd(q, k, v, t, heads, scale)
        want = _xla_temporal(q, k, v, t, heads, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
