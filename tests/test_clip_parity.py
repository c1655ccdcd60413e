"""CLIP-component parity: flax MHA vs torch.nn.MultiheadAttention (the only
open_clip-specific op whose conversion isn't covered by the UNet/VAE parity
tests — open_clip itself is not installed in this image)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcd_tpu.io.convert import convert_state_dict_to_params
from gcd_tpu.models.clip import MHA, CLIPBlock


def test_mha_matches_torch_multihead_attention(key):
    import torch

    c, heads, s, b = 64, 4, 10, 3
    torch.manual_seed(0)
    ref = torch.nn.MultiheadAttention(c, heads, batch_first=True)
    ref.eval()
    sd = {f"attn.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    model = MHA(heads=heads)
    x = np.random.default_rng(1).normal(size=(b, s, c)).astype(np.float32)
    template = jax.eval_shape(
        lambda: model.init(key, jnp.asarray(x)))["params"]
    # Wrap under "attn" to mirror the CLIP block nesting.
    params, missing, used = convert_state_dict_to_params(
        sd, {"attn": template}, torch_prefix="")
    assert missing == [], missing
    assert sorted(set(sd) - set(used)) == []

    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x), torch.from_numpy(x),
                         torch.from_numpy(x), need_weights=False)
    out = model.apply({"params": params["attn"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_clip_block_runs(key):
    block = CLIPBlock(heads=4)
    x = jnp.ones((2, 10, 64))
    params = jax.jit(block.init)(key, x)
    out = block.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
