"""Attention ops — the TPU-native replacement for the reference's xformers /
torch-SDPA CUDA kernels (gcd-model/sgm/modules/attention.py:15-36, 417-439).

Two paths:
  * `_xla_attention` — einsum attention with fp32 softmax. For GCD's sequence
    lengths (spatial <= 48*32 = 1536 tokens, temporal T = 14) XLA already fuses
    this well on the MXU; it is the correctness reference and CPU/test path.
  * `flash_attention` (ops/flash_attention.py) — Pallas fused kernel for TPU,
    selected automatically for large token counts on TPU backends.

Layout convention: (batch, seq, heads, head_dim) — "BSHD", matching jax
conventions (not torch's BHSD).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """(B, Sq, H, D) x (B, Sk, H, D) -> (B, Sq, H, D); softmax in fp32."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        logits = jnp.where(col <= row, logits, jnp.float32(-1e9))
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def _is_tpu_backend() -> bool:
    """True for real TPUs and TPU-tunnel plugins (the axon plugin reports
    platform 'axon' while driving a physical TPU chip)."""
    backend = jax.default_backend()
    return backend in ("tpu", "axon")


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Dispatching attention entry point used by all model code.

    use_flash=None selects automatically: Pallas flash kernel on TPU for
    sequences where tiling pays off, XLA einsum otherwise.
    """
    if causal:
        # Only the text towers (seq 77) use causal masking — XLA path.
        return _xla_attention(q, k, v, scale=scale, causal=True)
    from gcd_tpu.ops.dispatch import kernel_enabled

    if not kernel_enabled("flash"):
        use_flash = False
    if use_flash is None:
        # >=256 tokens: measured crossover on v5e — at 384 tokens (UNet ds2)
        # the Pallas kernel is ~1.6x faster than XLA's materialized softmax;
        # at 96 tokens (ds4) XLA's fusions win.
        use_flash = (
            _is_tpu_backend()
            and q.shape[1] >= 256
            and q.shape[1] == k.shape[1]
            and q.shape[-1] in (64, 128)
        )
    if use_flash:
        from gcd_tpu.ops.flash_attention import flash_attention

        # flash_attention differentiates via custom_vjp (XLA recompute
        # backward), so the fallback only guards Mosaic lowering failures.
        try:
            return flash_attention(q, k, v, scale=scale)
        except Exception:
            return _xla_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale=scale)
