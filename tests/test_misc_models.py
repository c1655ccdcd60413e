"""Tests for auxiliary models: LPIPS structure, extra embedders, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcd_tpu.models.lpips import LPIPS, VGG_STAGES
from gcd_tpu.models.embedders import ClassEmbedder, SpatialRescaler
from gcd_tpu.utils.metrics import psnr, ssim, masked_ssim, miou, rgb_to_class_ids


def test_lpips_structure_and_basic_properties(key):
    model = LPIPS()
    a = jax.random.uniform(key, (2, 32, 32, 3)) * 2 - 1
    b = a + 0.3 * jax.random.normal(jax.random.fold_in(key, 1), a.shape)

    @jax.jit
    def run(key):
        params = model.init(key, a, b)
        same = model.apply(params, a, a)
        diff = model.apply(params, a, b)
        return same, diff

    same, diff = run(key)
    assert same.shape == (2,)
    np.testing.assert_allclose(np.asarray(same), 0.0, atol=1e-5)
    assert (np.asarray(diff) > 0).all()


def test_class_embedder(key):
    emb = ClassEmbedder(embed_dim=16, n_classes=10)
    params = emb.init(key, jnp.zeros((4,), jnp.int32))
    out = emb.apply(params, jnp.asarray([1, 2, 3, 9]))
    assert out.shape == (4, 16)
    assert emb.get_unconditional_conditioning_value() == 9


def test_spatial_rescaler(key):
    r = SpatialRescaler(n_stages=2, multiplier=0.5, out_channels=8)
    x = jnp.ones((2, 32, 32, 3))
    params = r.init(key, x)
    out = r.apply(params, x)
    assert out.shape == (2, 8, 8, 8)


def test_text_embedders_accept_token_arrays():
    # Full coverage lives in tests/test_text_towers.py; this covers the
    # conditioner-facing contract: token arrays in, crossattn-rank out.
    import jax
    import jax.numpy as jnp

    from gcd_tpu.models.embedders import FrozenT5Embedder

    t5 = FrozenT5Embedder(d_model=16, d_ff=32, num_layers=1, num_heads=2,
                          d_kv=8, vocab_size=64)
    tokens = jnp.zeros((2, 7), jnp.int32)
    variables = t5.init(jax.random.PRNGKey(0), tokens)
    z = t5.apply(variables, tokens)
    assert z.shape == (2, 7, 16)


def test_psnr_ssim_sanity():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    assert abs(ssim(a, a) - 1.0) < 1e-6
    noisy = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    p = psnr(a, noisy)
    assert 15 < p < 25
    assert 0 < ssim(a, noisy) < 1
    mask = np.zeros((32, 32), bool)
    mask[:16] = True
    m1 = masked_ssim(a, noisy, mask)
    m2 = masked_ssim(a, noisy, ~mask)
    assert 0 < m1 < 1 and 0 < m2 < 1


def test_miou_and_color_matching():
    colors = np.array([[0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]])
    img = np.zeros((4, 4, 3), np.float32)
    img[:2] = [1.0, 0, 0]
    ids = rgb_to_class_ids(img, colors)
    assert (ids[:2] == 1).all() and (ids[2:] == 0).all()
    assert miou(ids, ids) == 1.0
    pred = ids.copy()
    pred[0] = 0  # half of class-1 rows mislabeled
    assert 0 < miou(pred, ids) < 1.0


def test_low_scale_encoder():
    import jax
    import jax.numpy as jnp

    from gcd_tpu.models.embedders import LowScaleEncoder

    enc = LowScaleEncoder(
        model_config={"params": {"embed_dim": 4, "ddconfig": {
            "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
            "attn_resolutions": [], "in_channels": 3, "out_ch": 3,
            "resolution": 32, "z_channels": 4, "double_z": True}}},
        output_size=8, timesteps=50, max_noise_level=20)
    x = jnp.ones((2, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(0),
            "gaussian": jax.random.PRNGKey(1),
            "noise_level": jax.random.PRNGKey(2),
            "q_noise": jax.random.PRNGKey(3)}

    def init_all(mdl, x):
        # trace encode AND decode so both parameter sets are created
        z, nl = mdl(x)
        return z, nl, mdl.decode(jnp.zeros((2, 16, 16, 4)))

    variables = jax.jit(lambda: enc.init(rngs, x, method=init_all))()
    z, nl = enc.apply(variables, x,
                      rngs={k: v for k, v in rngs.items() if k != "params"})
    assert z.shape == (2, 8, 8, 4)
    assert nl.shape == (2,) and int(nl.max()) < 20
    rec = enc.apply(variables, jnp.zeros((2, 16, 16, 4)), method="decode")
    assert rec.shape == (2, 32, 32, 3)


def test_sgm_util_helpers():
    from gcd_tpu.utils.misc import (
        autocast,
        get_nested_attribute,
        get_string_from_tuple,
        is_power_of_two,
        isheatmap,
        isimage,
        ismap,
        log_txt_as_img,
        make_path_absolute,
        mean_flat,
        partialclass,
    )
    import jax.numpy as jnp

    assert is_power_of_two(16) and not is_power_of_two(0) and not is_power_of_two(12)
    assert get_string_from_tuple("('a', 'b')") == "a"
    assert get_string_from_tuple("plain") == "plain"
    x = jnp.ones((2, 3, 4))
    assert mean_flat(x).shape == (2,)
    assert ismap(jnp.zeros((1, 4, 4, 7)))
    assert isimage(jnp.zeros((1, 4, 4, 3)))
    assert isheatmap(jnp.zeros((4, 4)))
    assert make_path_absolute("a/b").startswith("/")
    assert autocast(lambda v: v + 1)(2) == 3

    img = log_txt_as_img((64, 32), ["hello", "world"])
    assert img.shape == (2, 32, 64, 3)
    assert -1.0 <= float(img.min()) and float(img.max()) <= 1.0

    class Leaf:
        v = 7

    class Root:
        items = [Leaf()]

    assert get_nested_attribute(Root(), "items.0.v") == 7

    class A:
        def __init__(self, x, y=1):
            self.x, self.y = x, y

    B = partialclass(A, 5)
    assert B(y=3).x == 5 and B.__name__ == "A"


def test_nearest_upsample_2x_matches_resize():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcd_tpu.ops.basic import nearest_upsample_2x

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 3))
    got = nearest_upsample_2x(x)
    want = jax.image.resize(x, (2, 10, 14, 3), method="nearest")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_latent_lpips():
    """LatentLPIPS (autoencoding/losses/lpips.py:8): latent L2 + decoded
    LPIPS; loud error when perceptual params are missing."""
    import jax
    import jax.numpy as jnp
    import pytest

    from gcd_tpu.models.lpips import LPIPS
    from gcd_tpu.utils.config import instantiate_from_config

    dd = dict(ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
              z_channels=4, double_z=True, in_channels=3, out_ch=3,
              resolution=32, dropout=0.0)
    m = instantiate_from_config({
        "target": "sgm.modules.autoencoding.losses.lpips.LatentLPIPS",
        "params": {
            "decoder_config": {
                "target": "sgm.models.autoencoder.AutoencoderKL",
                "params": {"embed_dim": 4, "ddconfig": dd,
                           "lossconfig": {"target": "torch.nn.Identity"}},
            },
            "perceptual_weight": 1.0, "latent_weight": 1.0,
        },
    })
    key = jax.random.PRNGKey(0)
    dec_params = m.decoder.init(key, img_hw=(32, 32))
    lp = LPIPS()
    img = jax.random.normal(key, (2, 32, 32, 3))
    lp_params = lp.init(key, img, img)["params"]

    za = jax.random.normal(key, (2, 16, 16, 4))
    zb = za + 0.1
    loss, log = m(za, zb, decoder_params=dec_params, lpips_params=lp_params)
    assert jnp.isfinite(loss).all()
    assert "train/latent_l2_loss" in log and "train/perceptual_loss" in log
    # identical latents -> zero latent and perceptual terms
    loss0, _ = m(za, za, decoder_params=dec_params, lpips_params=lp_params)
    assert float(loss0) < 1e-5

    with pytest.raises(ValueError):
        m(za, zb)
