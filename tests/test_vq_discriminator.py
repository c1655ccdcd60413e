"""VQ regularizers + PatchGAN discriminator loss (reference:
sgm/modules/autoencoding/regularizers/quantize.py and
losses/discriminator_loss.py — unused by GCD configs, part of the surface)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gcd_tpu.models.vq import (
    EMAVectorQuantizer,
    GumbelQuantizer,
    VectorQuantizer,
    VectorQuantizerWithInputProjection,
)
from gcd_tpu.models.discriminator import (
    GeneralLPIPSWithDiscriminator,
    NLayerDiscriminator,
    adaptive_weight_from_grads,
    hinge_d_loss,
    vanilla_d_loss,
)


def test_vector_quantizer_roundtrip_and_loss():
    vq = VectorQuantizer(n_e=16, e_dim=8, beta=0.25, sane_index_shape=True,
                         log_perplexity=True)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    variables = vq.init(jax.random.PRNGKey(1), z)
    z_q, ld = vq.apply(variables, z)
    assert z_q.shape == z.shape
    assert ld["min_encoding_indices"].shape == (2, 4, 4)
    assert float(ld["loss/vq"]) > 0
    assert 1.0 <= float(ld["perplexity"]) <= 16.0
    # straight-through: gradient of sum(z_q) w.r.t. z is ones
    g = jax.grad(lambda z: jnp.sum(vq.apply(variables, z)[0]))(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
    # codebook entries are the nearest neighbours
    emb = variables["params"]["embedding"]
    idx = np.asarray(ld["min_encoding_indices"]).reshape(-1)
    want = np.asarray(emb)[idx].reshape(z.shape)
    got = np.asarray(z + jax.lax.stop_gradient(z_q - z))  # == z_q values
    np.testing.assert_allclose(np.asarray(z_q), got, atol=1e-6)
    sq = np.asarray(vq.get_codebook_entry(variables, jnp.asarray(idx),
                                          shape=(2, 4, 4, 8)))
    np.testing.assert_allclose(sq, want, atol=1e-6)


def test_vq_matches_torch_reference_math():
    torch = pytest.importorskip("torch")
    n_e, e_dim = 12, 6
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(n_e, e_dim)).astype(np.float32)
    z = rng.normal(size=(2, 3, 3, e_dim)).astype(np.float32)

    vq = VectorQuantizer(n_e=n_e, e_dim=e_dim, beta=0.25)
    variables = {"params": {"embedding": jnp.asarray(emb)}}
    z_q, ld = vq.apply(variables, jnp.asarray(z))

    # hand torch reference (quantize.py:235-301)
    zt = torch.from_numpy(z.reshape(-1, e_dim))
    et = torch.from_numpy(emb)
    d = (zt.pow(2).sum(1, keepdim=True) + et.pow(2).sum(1)
         - 2 * zt @ et.T)
    idx = torch.argmin(d, dim=1)
    zq_t = et[idx].reshape(z.shape)
    loss_t = 0.25 * torch.mean((zq_t - torch.from_numpy(z)) ** 2) + \
        torch.mean((zq_t - torch.from_numpy(z)) ** 2)
    np.testing.assert_allclose(np.asarray(z_q), zq_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(float(ld["loss/vq"]), float(loss_t), atol=1e-5)


def test_vq_with_input_projection():
    vq = VectorQuantizerWithInputProjection(
        input_dim=8, n_codes=16, codebook_dim=4, output_dim=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    variables = vq.init(jax.random.PRNGKey(1), z)
    z_q, ld = vq.apply(variables, z)
    assert z_q.shape == z.shape
    assert "loss/vq" in ld


def test_gumbel_quantizer_train_eval():
    gq = GumbelQuantizer(num_hiddens=8, embedding_dim=6, n_embed=16)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    variables = gq.init(jax.random.PRNGKey(1), z, training=False)
    zq_eval, ld = gq.apply(variables, z, training=False)
    assert zq_eval.shape == (2, 4, 4, 6)
    assert ld["indices"].shape == (2, 4, 4)
    zq_tr, ld_tr = gq.apply(variables, z, key=jax.random.PRNGKey(2),
                            training=True)
    assert np.isfinite(np.asarray(zq_tr)).all()
    assert np.isfinite(float(ld_tr["loss/vq"]))


def test_ema_vq_updates_codebook():
    vq = EMAVectorQuantizer(n_embed=8, embedding_dim=4, beta=0.25, decay=0.5)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4))
    variables = vq.init(jax.random.PRNGKey(1), z, training=False)
    w0 = np.asarray(variables["ema"]["weight"])
    (zq, ld), updates = vq.apply(variables, z, training=True, mutable=["ema"])
    w1 = np.asarray(updates["ema"]["weight"])
    assert not np.allclose(w0, w1)
    assert zq.shape == z.shape and np.isfinite(float(ld["perplexity"]))


def test_nlayer_discriminator_patch_logits():
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = disc.init(jax.random.PRNGKey(1), x, training=False)
    out = disc.apply(variables, x, training=False)
    # PatchGAN: 3 stride-2 convs except the last two -> 64/8 - pads = 6x6 map
    assert out.ndim == 4 and out.shape[0] == 2 and out.shape[-1] == 1
    assert np.isfinite(np.asarray(out)).all()


def test_discriminator_matches_torch_shapes():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    # reference layer stack (model.py:17-87) output shape for 64x64 input
    kw, padw, ndf, n_layers = 4, 1, 8, 3
    seq = [tnn.Conv2d(3, ndf, kw, 2, padw), tnn.LeakyReLU(0.2, True)]
    nf = 1
    for n in range(1, n_layers):
        nf_prev, nf = nf, min(2 ** n, 8)
        seq += [tnn.Conv2d(ndf * nf_prev, ndf * nf, kw, 2, padw, bias=False),
                tnn.BatchNorm2d(ndf * nf), tnn.LeakyReLU(0.2, True)]
    nf_prev, nf = nf, min(2 ** n_layers, 8)
    seq += [tnn.Conv2d(ndf * nf_prev, ndf * nf, kw, 1, padw, bias=False),
            tnn.BatchNorm2d(ndf * nf), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * nf, 1, kw, 1, padw)]
    ref = tnn.Sequential(*seq).eval()
    with torch.no_grad():
        want = ref(torch.zeros(2, 3, 64, 64)).shape

    disc = NLayerDiscriminator(input_nc=3, ndf=ndf, n_layers=n_layers)
    x = jnp.zeros((2, 64, 64, 3))
    variables = disc.init(jax.random.PRNGKey(0), x, training=False)
    out = disc.apply(variables, x, training=False)
    assert (out.shape[0], out.shape[3], out.shape[1], out.shape[2]) == tuple(want)


def test_gan_losses_and_adaptive_weight():
    lr = jnp.asarray([0.5, -0.2])
    lf = jnp.asarray([0.1, 0.3])
    h = hinge_d_loss(lr, lf)
    v = vanilla_d_loss(lr, lf)
    # torch-checked closed forms
    np.testing.assert_allclose(float(h), 0.5 * ((0.5 + 1.2) / 2 + (1.1 + 1.3) / 2),
                               rtol=1e-6)
    assert np.isfinite(float(v))
    w = adaptive_weight_from_grads(
        {"k": jnp.ones((3,))}, {"k": jnp.full((3,), 2.0)},
        discriminator_weight=0.5)
    np.testing.assert_allclose(float(w), 0.5 * np.sqrt(3) / (2 * np.sqrt(3) + 1e-4),
                               rtol=1e-4)


def test_general_lpips_with_discriminator_phases():
    loss_mod = GeneralLPIPSWithDiscriminator(
        disc_start=0, disc_num_layers=2, perceptual_weight=0.0,
        regularization_weights={"kl_loss": 1e-6})
    variables = loss_mod.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    rec = x + 0.1 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
    gl, glog = loss_mod(variables, x, rec, optimizer_idx=0, global_step=10,
                        regularization_log={"kl_loss": jnp.asarray(0.5)})
    assert np.isfinite(float(gl))
    assert "train/loss/nll" in glog and "train/loss/g" in glog
    dl, dlog = loss_mod(variables, x, rec, optimizer_idx=1, global_step=10)
    assert np.isfinite(float(dl))
    assert "train/loss/disc" in dlog
    # before disc_start the discriminator terms are inactive — but only while
    # training (eval always activates them, discriminator_loss.py:242,280)
    loss_mod2 = GeneralLPIPSWithDiscriminator(
        disc_start=100, disc_num_layers=2, perceptual_weight=0.0)
    dl0, _, _ = loss_mod2(variables, x, rec, optimizer_idx=1, global_step=10,
                          training=True)
    np.testing.assert_allclose(float(dl0), 0.0, atol=1e-7)
    dl_eval, _ = loss_mod2(variables, x, rec, optimizer_idx=1, global_step=10)
    assert float(dl_eval) > 0.0


def test_perceptual_term_broadcasts_per_sample():
    """LPIPS returns (N,); the loss must lift it to (N,1,1,1) before adding
    to the (N,H,W,C) pixel loss (reference keeps p_loss (N,1,1,1)) — and the
    degenerate N==C case must not silently broadcast over channels."""
    from gcd_tpu.models.lpips import LPIPS

    lp = LPIPS()
    lpips_vars = lp.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))
    loss_mod = GeneralLPIPSWithDiscriminator(
        disc_start=0, disc_num_layers=2, perceptual_weight=1.0,
        regularization_weights={})
    variables = loss_mod.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
    # N == C == 3: a flat (N,) add would mis-broadcast instead of crashing
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    rec = x + 0.1
    gl, glog = loss_mod(variables, x, rec, optimizer_idx=0, global_step=10,
                        lpips_params=lpips_vars)
    assert np.isfinite(float(gl))
    assert float(glog["train/loss/rec"]) > 0.0


def test_discriminator_training_threads_batch_stats():
    """Train-mode passes must return updated BatchNorm running stats
    (ADVICE.md round-1 medium finding) and run both passes in train mode."""
    loss_mod = GeneralLPIPSWithDiscriminator(
        disc_start=0, disc_num_layers=2, perceptual_weight=0.0)
    variables = loss_mod.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    rec = x + 0.1

    dl, _, new_vars = loss_mod(variables, x, rec, optimizer_idx=1,
                               global_step=10, training=True)
    assert np.isfinite(float(dl))
    old_stats = jax.tree_util.tree_leaves(variables["batch_stats"])
    new_stats = jax.tree_util.tree_leaves(new_vars["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(old_stats, new_stats)), (
        "discriminator-phase training did not update BatchNorm running stats")

    gl, _, gen_vars = loss_mod(variables, x, rec, optimizer_idx=0,
                               global_step=10, training=True, d_weight=1.0)
    assert np.isfinite(float(gl))
    gen_stats = jax.tree_util.tree_leaves(gen_vars["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(old_stats, gen_stats)), (
        "generator-phase training did not update BatchNorm running stats")

    # perceptual_weight > 0 without lpips params must be a loud error
    lm = GeneralLPIPSWithDiscriminator(
        disc_start=0, disc_num_layers=2, perceptual_weight=1.0)
    with pytest.raises(ValueError, match="lpips_params"):
        lm(variables, x, rec, optimizer_idx=0, global_step=10)


def test_config_instantiation():
    from gcd_tpu.utils.config import instantiate_from_config

    vq = instantiate_from_config({
        "target": "sgm.modules.autoencoding.regularizers.quantize.VectorQuantizer",
        "params": {"n_e": 8, "e_dim": 4},
    })
    assert isinstance(vq, VectorQuantizer)
    dm = instantiate_from_config({
        "target": ("sgm.modules.autoencoding.losses.discriminator_loss."
                   "GeneralLPIPSWithDiscriminator"),
        "params": {"disc_start": 5000},
    })
    assert isinstance(dm, GeneralLPIPSWithDiscriminator)


def test_vq_regularizer_in_autoencoding_engine():
    from gcd_tpu.models.vae import AutoencodingEngine

    engine = AutoencodingEngine(
        encoder_config={
            "target": "gcd_tpu.models.vae.Encoder",
            "params": {"ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
                       "attn_resolutions": [], "in_channels": 3,
                       "out_ch": 3, "resolution": 16, "z_channels": 4,
                       "double_z": False},
        },
        decoder_config={
            "target": "gcd_tpu.models.vae.Decoder",
            "params": {"ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
                       "attn_resolutions": [], "in_channels": 3,
                       "out_ch": 3, "resolution": 16, "z_channels": 4},
        },
        regularizer_config={
            "target": ("sgm.modules.autoencoding.regularizers.quantize."
                       "VectorQuantizer"),
            "params": {"n_e": 16, "e_dim": 4},
        },
    )
    params = engine.init(jax.random.PRNGKey(0), img_hw=(16, 16), t=1)
    assert "regularization" in params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    z = engine.encode(params, x)
    assert z.shape[-1] == 4
    rec = engine.decode(params, z)
    assert rec.shape == x.shape
