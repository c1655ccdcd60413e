"""Text encoder towers: CLIP text transformer + T5 encoder, in flax.

These back the reference's text embedders (gcd-model/sgm/modules/encoders/
modules.py: FrozenT5Embedder :332, FrozenByT5Embedder :372, FrozenCLIPEmbedder
:414, FrozenOpenCLIPEmbedder2 :479, FrozenOpenCLIPEmbedder :581). No GCD config
uses text conditioning (SURVEY.md §2.1), but the towers are part of the sgm API
surface, so they are implemented fully rather than stubbed. Weights convert
from HF / open_clip checkpoints via gcd_tpu.io.convert name maps; parity is
tested against the torch `transformers` implementations on random small
configs (tests/test_text_towers.py).

Both towers run attention through gcd_tpu.ops.attention (XLA path — sequence
length is 77, far below the flash-kernel crossover).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcd_tpu.models.clip import CLIPBlock
from gcd_tpu.ops.attention import dot_product_attention

Dtype = Any


class CLIPTextTower(nn.Module):
    """CLIP text transformer (OpenCLIP `model.transformer` + token/positional
    embeddings / HF `CLIPTextModel` — the math is identical; only checkpoint
    key names differ). Causal self-attention over a fixed 77-token context,
    pre-LN blocks, final LayerNorm, eot-pooling.

    Returns a dict:
      "last"        — final-block hidden states *before* ln_final (B, S, W)
      "penultimate" — hidden states entering the last block (B, S, W)
      "hidden"      — all per-layer states [embeddings, after block 0, ...]
      "normed"      — ln_final(last) (HF last_hidden_state)
      "pooled"      — eot-token embedding of "normed", projected when
                      `output_dim` is set (OpenCLIP pool) and raw otherwise
                      (HF pooler_output)
    """

    vocab_size: int = 49408
    width: int = 1024
    layers: int = 24
    heads: int = 16
    context_length: int = 77
    output_dim: Optional[int] = 1024
    quick_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        assert tokens.ndim == 2, f"tokens must be (B, S), got {tokens.shape}"
        n, s = tokens.shape

        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.vocab_size, self.width),
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width),
        )
        h = tok_emb[tokens].astype(self.dtype) + pos_emb[:s].astype(self.dtype)

        hidden: List[jnp.ndarray] = [h]
        for i in range(self.layers):
            h = CLIPBlock(
                heads=self.heads,
                causal=True,
                quick_gelu=self.quick_gelu,
                dtype=self.dtype,
                name=f"resblocks_{i}",
            )(h)
            hidden.append(h)

        ln_final = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")
        normed = ln_final(hidden[-1].astype(jnp.float32)).astype(h.dtype)
        normed_penultimate = ln_final(
            hidden[-2].astype(jnp.float32)
        ).astype(h.dtype)

        # eot pooling: the eot token has the highest id in each row
        # (modules.py:553-560).
        eot = jnp.argmax(tokens, axis=-1)
        pooled = normed[jnp.arange(n), eot]
        if self.output_dim is not None:
            proj = self.param(
                "text_projection",
                nn.initializers.normal(stddev=self.width**-0.5),
                (self.width, self.output_dim),
            ).astype(pooled.dtype)
            pooled = pooled @ proj

        return {
            "last": hidden[-1],
            "penultimate": hidden[-2],
            "hidden": hidden,
            "normed": normed,
            "normed_penultimate": normed_penultimate,
            "pooled": pooled,
        }


def _t5_relative_position_bucket(
    relative_position: jnp.ndarray,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing (matches HF
    T5Attention._relative_position_bucket with bidirectional=True)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    # clamp below max_exact before the log: those lanes are selected away by
    # `is_small`, and this keeps the large-branch math bit-exact with HF.
    n_large = jnp.maximum(n, max_exact)
    val_if_large = max_exact + (
        jnp.log(n_large.astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    heads: int
    d_kv: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, position_bias: jnp.ndarray) -> jnp.ndarray:
        b, s, _ = x.shape
        inner = self.heads * self.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, s, self.heads, self.d_kv)
        k = k.reshape(b, s, self.heads, self.d_kv)
        v = v.reshape(b, s, self.heads, self.d_kv)
        # T5 does not scale q by 1/sqrt(d) (folded into initialization) and
        # adds a learned relative-position bias to the logits.
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        logits = logits + position_bias.astype(logits.dtype)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        return nn.Dense(
            x.shape[-1], use_bias=False, dtype=self.dtype, name="o"
        )(out.reshape(b, s, inner))


class T5RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (w * (xf * jax.lax.rsqrt(var + self.eps)).astype(x.dtype))


class T5Encoder(nn.Module):
    """T5/ByT5 encoder stack (T5 v1.1 style: RMSNorm, gated-GELU FF, shared
    relative-position bias owned by block 0). Matches HF `T5EncoderModel`
    forward: embed -> N x (RMSNorm->attn->res; RMSNorm->FF->res) -> RMSNorm."""

    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    gated_ff: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        assert tokens.ndim == 2
        s = tokens.shape[1]

        emb = self.param(
            "shared", nn.initializers.normal(stddev=1.0),
            (self.vocab_size, self.d_model),
        )
        h = emb[tokens].astype(self.dtype)

        # Relative position bias, computed once and shared across layers.
        ctx = jnp.arange(s)[:, None]
        mem = jnp.arange(s)[None, :]
        buckets = _t5_relative_position_bucket(
            mem - ctx,
            num_buckets=self.relative_attention_num_buckets,
            max_distance=self.relative_attention_max_distance,
        )
        rel_emb = self.param(
            "relative_attention_bias",
            nn.initializers.normal(stddev=1.0),
            (self.relative_attention_num_buckets, self.num_heads),
        )
        position_bias = jnp.transpose(rel_emb[buckets], (2, 0, 1))[None]

        for i in range(self.num_layers):
            a = T5RMSNorm(name=f"block_{i}_ln_0")(h)
            h = h + T5SelfAttention(
                heads=self.num_heads, d_kv=self.d_kv, dtype=self.dtype,
                name=f"block_{i}_attn",
            )(a, position_bias)
            f = T5RMSNorm(name=f"block_{i}_ln_1")(h)
            if self.gated_ff:
                g = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype,
                             name=f"block_{i}_wi_0")(f)
                u = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype,
                             name=f"block_{i}_wi_1")(f)
                f = jax.nn.gelu(g, approximate=True) * u
            else:
                f = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype,
                             name=f"block_{i}_wi")(f)
                f = jax.nn.relu(f)
            h = h + nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                             name=f"block_{i}_wo")(f)

        return T5RMSNorm(name="final_layer_norm")(h)


def byt5_tokenize(texts, max_length: int = 77) -> jnp.ndarray:
    """ByT5 tokenization is asset-free: utf-8 bytes shifted by 3 special
    tokens (pad=0, eos=1, unk=2), eos-terminated, padded to max_length."""
    import numpy as np

    out = np.zeros((len(texts), max_length), dtype=np.int32)
    for i, t in enumerate(texts):
        ids = [b + 3 for b in t.encode("utf-8")][: max_length - 1] + [1]
        out[i, : len(ids)] = ids
    return jnp.asarray(out)
