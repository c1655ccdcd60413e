"""ops/temporal_attention: fused temporal self-attention block (experimental;
auto-falls back to the XLA path — the remote Mosaic compile helper currently
rejects the full-T unrolled kernel, see module docstring)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gcd_tpu.ops.temporal_attention import (
    _fused_forward,
    _xla_temporal,
    temporal_self_attention_block,
)


def _make(b=2, t=4, s=8, c=16, heads=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (b * t, s, c))
    wq = jax.random.normal(ks[1], (c, c)) * 0.2
    wk = jax.random.normal(ks[2], (c, c)) * 0.2
    wv = jax.random.normal(ks[3], (c, c)) * 0.2
    wo = jax.random.normal(ks[4], (c, c)) * 0.2
    bo = jax.random.normal(ks[5], (c,)) * 0.1
    return x, wq, wk, wv, wo, bo


def _reference(x, wq, wk, wv, wo, bo, t, heads):
    """Direct (B*S, T) attention, the reference formulation."""
    bt, s, c = x.shape
    b = bt // t
    d = c // heads
    q = (x @ wq).reshape(b, t, s, heads, d).transpose(0, 2, 3, 1, 4)
    k = (x @ wk).reshape(b, t, s, heads, d).transpose(0, 2, 3, 1, 4)
    v = (x @ wv).reshape(b, t, s, heads, d).transpose(0, 2, 3, 1, 4)
    logits = np.einsum("bshud,bshvd->bshuv", q, k) * d**-0.5
    p = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    out = np.einsum("bshuv,bshvd->bshud", np.asarray(p), v)
    out = out.transpose(0, 3, 1, 2, 4).reshape(bt, s, c)
    return out @ wo + bo


def test_xla_path_matches_reference():
    x, wq, wk, wv, wo, bo = _make()
    got = _xla_temporal(x, wq, wk, wv, wo, bo, 4, 2, (16 // 2) ** -0.5)
    want = _reference(np.asarray(x), np.asarray(wq), np.asarray(wk),
                      np.asarray(wv), np.asarray(wo), np.asarray(bo), 4, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_kernel_interpret_matches_xla():
    x, wq, wk, wv, wo, bo = _make()
    scale = (16 // 2) ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = _fused_forward(x, wq, wk, wv, wo, bo.reshape(1, -1),
                             t=4, heads=2, scale=scale, ts=8)
    want = _xla_temporal(x, wq, wk, wv, wo, bo, 4, 2, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_entry_point_and_grads():
    x, wq, wk, wv, wo, bo = _make()

    def loss(x, wq, wk, wv, wo, bo):
        return jnp.sum(
            temporal_self_attention_block(x, wq, wk, wv, wo, bo, 4, 2) ** 2)

    val = jax.jit(loss)(x, wq, wk, wv, wo, bo)
    assert np.isfinite(float(val))
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 5)))(x, wq, wk, wv, wo, bo)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
