"""Text-tower parity vs HF `transformers` torch implementations.

The reference instantiates T5EncoderModel / CLIPTextModel / open_clip text
towers directly (gcd-model/sgm/modules/encoders/modules.py:332-651); here we
verify our flax towers reproduce the same math by loading random torch weights
through gcd_tpu.io.convert and comparing outputs elementwise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gcd_tpu.io.convert import (
    convert_state_dict_to_params,
    hf_clip_text_to_openclip_sd,
    openclip_text_rename,
    t5_rename,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _sd_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def test_t5_encoder_parity():
    from transformers import T5Config, T5EncoderModel

    from gcd_tpu.models.text_towers import T5Encoder

    cfg = T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    ref = T5EncoderModel(cfg).eval()

    tokens = np.random.default_rng(0).integers(0, 100, (2, 11)).astype(np.int32)
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(tokens).long()).last_hidden_state.numpy()

    enc = T5Encoder(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=3, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
    )
    template = jax.eval_shape(enc.init, jax.random.PRNGKey(0), jnp.asarray(tokens))
    params, missing, used = convert_state_dict_to_params(
        _sd_numpy(ref), template["params"], rename=t5_rename
    )
    assert not missing, missing
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_t5_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    from gcd_tpu.models.text_towers import _t5_relative_position_bucket

    rel = np.arange(-300, 301).reshape(1, -1)
    want = T5Attention._relative_position_bucket(
        torch.from_numpy(rel).long(), bidirectional=True, num_buckets=32,
        max_distance=128,
    ).numpy()
    got = np.asarray(_t5_relative_position_bucket(jnp.asarray(rel)))
    np.testing.assert_array_equal(got, want)


def test_clip_text_tower_parity_hf():
    from transformers import CLIPTextConfig, CLIPTextModel

    from gcd_tpu.models.text_towers import CLIPTextTower

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
        eos_token_id=98, bos_token_id=97,
    )
    torch.manual_seed(0)
    ref = CLIPTextModel(cfg).eval()

    rng = np.random.default_rng(1)
    tokens = rng.integers(3, 90, (2, 13)).astype(np.int32)
    # eot (= highest id, 98) at a known position per row; both pooling
    # conventions (argmax / eos-search) then agree.
    tokens[0, 7] = 98
    tokens[1, 11] = 98
    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(tokens).long())
    want_last = out.last_hidden_state.numpy()
    want_pool = out.pooler_output.numpy()

    tower = CLIPTextTower(
        vocab_size=99, width=32, layers=2, heads=4, context_length=77,
        output_dim=None, quick_gelu=True,
    )
    tj = jnp.asarray(tokens)
    template = jax.eval_shape(tower.init, jax.random.PRNGKey(0), tj)
    sd = hf_clip_text_to_openclip_sd(_sd_numpy(ref))
    params, missing, used = convert_state_dict_to_params(
        sd, template["params"], rename=openclip_text_rename
    )
    assert not missing, missing
    got = tower.apply({"params": params}, tj)
    np.testing.assert_allclose(np.asarray(got["normed"]), want_last,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got["pooled"]), want_pool,
                               atol=2e-4, rtol=2e-4)


def test_byt5_tokenize():
    from gcd_tpu.models.text_towers import byt5_tokenize

    toks = np.asarray(byt5_tokenize(["hi", "a" * 200], max_length=16))
    assert toks.shape == (2, 16)
    # 'h' = 104, 'i' = 105, +3 special offset; eos = 1, pad = 0
    assert toks[0, 0] == 107 and toks[0, 1] == 108 and toks[0, 2] == 1
    assert toks[0, 3:].max() == 0
    assert toks[1, -1] == 1  # truncated to max_length-1 bytes + eos


def test_frozen_byt5_embedder_runs():
    from gcd_tpu.models.embedders import FrozenByT5Embedder

    emb = FrozenByT5Embedder(
        version="google/byt5-base", max_length=12,
        d_model=32, d_ff=64, num_layers=2, num_heads=4, d_kv=8, vocab_size=384,
    )
    variables = emb.init(jax.random.PRNGKey(0), ["hello", "world!"])
    z = emb.apply(variables, ["hello", "world!"])
    assert z.shape == (2, 12, 32)
    assert np.isfinite(np.asarray(z)).all()


def test_openclip_embedder_layer_semantics():
    from gcd_tpu.models.embedders import (
        FrozenOpenCLIPEmbedder,
        FrozenOpenCLIPEmbedder2,
    )

    tokens = jnp.asarray(
        np.random.default_rng(2).integers(0, 50, (2, 9)).astype(np.int32)
    )
    kw = dict(arch="ViT-H-14", max_length=9, width=32, layers=3,
              heads=4, output_dim=24, vocab_size=64)
    last = FrozenOpenCLIPEmbedder(layer="last", **kw)
    variables = last.init(jax.random.PRNGKey(0), tokens)
    z_last = last.apply(variables, tokens)
    pen = FrozenOpenCLIPEmbedder(layer="penultimate", **kw)
    z_pen = pen.apply(variables, tokens)  # same tree: params independent of layer
    assert z_last.shape == z_pen.shape == (2, 9, 32)
    assert not np.allclose(np.asarray(z_last), np.asarray(z_pen))

    e2 = FrozenOpenCLIPEmbedder2(layer="last", legacy=False,
                                 always_return_pooled=True, **kw)
    v2 = e2.init(jax.random.PRNGKey(0), tokens)
    z, pooled = e2.apply(v2, tokens)
    assert z.shape == (2, 9, 32) and pooled.shape == (2, 24)
    # legacy=True matches FrozenOpenCLIPEmbedder's ln_final(hidden) output
    # given identical tower params
    e2l = FrozenOpenCLIPEmbedder2(layer="last", legacy=True, **kw)
    zl = e2l.apply(variables, tokens)
    np.testing.assert_allclose(np.asarray(zl), np.asarray(z_last), atol=1e-6)


def test_t5_string_path_raises_without_assets():
    from gcd_tpu.models.embedders import FrozenT5Embedder

    emb = FrozenT5Embedder(d_model=16, d_ff=32, num_layers=1, num_heads=2,
                           d_kv=8, vocab_size=64)
    with pytest.raises(Exception, match="locally|egress|tokeniz"):
        emb.init(jax.random.PRNGKey(0), ["hello"])
