"""Numerical parity vs the reference torch implementation (test oracle via
tests/ref_oracle.py — skipped when /root/reference is absent).

These tests validate the two hardest requirements at once (SURVEY.md section 7
"Hard parts"): the torch->flax weight-conversion name map covers every
parameter, and the converted model reproduces the reference's forward pass
numerically (fp32, CPU)."""

import numpy as np
import pytest

from tests.ref_oracle import setup_reference_imports

pytestmark = pytest.mark.skipif(
    not setup_reference_imports(), reason="reference mount unavailable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gcd_tpu.io.convert import convert_state_dict_to_params  # noqa: E402

TINY_UNET = dict(
    in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
    attention_resolutions=[2, 1], channel_mult=[1, 2], num_head_channels=16,
    transformer_depth=1, context_dim=24, use_linear_in_transformer=True,
    extra_ff_mix_layer=True, use_spatial_context=True,
    merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
    num_classes="sequential", adm_in_channels=20, aux_emb_dim=6,
)

T, H, W = 3, 16, 16


def fill_zero_params(net, seed: int) -> None:
    """Replace all-zero parameters (the reference's zero_module-initialized
    output projections) with small seeded noise, in place. Without this a
    freshly-initialized UNet forward collapses to the skip paths and returns
    exactly 0, making output parity vacuous."""
    import torch

    rng = np.random.default_rng(seed)
    sd = net.state_dict()
    for k, v in sd.items():
        if v.numel() and not v.any():
            sd[k] = torch.from_numpy(
                rng.normal(0.0, 0.02, tuple(v.shape)).astype(np.float32))
    net.load_state_dict(sd)


def _torch_unet(seed=0):
    import torch

    from tests.ref_oracle import get_reference_video_unet

    torch.manual_seed(seed)
    net = get_reference_video_unet(
        **TINY_UNET, spatial_transformer_attn_type="softmax")
    net.eval()
    fill_zero_params(net, seed=seed + 100)
    return net


def _flax_unet():
    from gcd_tpu.models.unet import VideoUNet

    return VideoUNet(**TINY_UNET)


@pytest.fixture(scope="module")
def converted():
    import torch

    net = _torch_unet()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    model = _flax_unet()
    x = jnp.zeros((T, H, W, 8))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, jnp.zeros((T,)),
                           jnp.zeros((T, 1, 24)), jnp.zeros((T, 26)),
                           num_video_frames=T,
                           image_only_indicator=jnp.zeros((1, T)))
    )["params"]
    params, missing, used = convert_state_dict_to_params(sd, template)
    unexpected = sorted(set(sd) - set(used))
    return net, model, params, missing, unexpected


def test_conversion_covers_every_parameter(converted):
    net, model, params, missing, unexpected = converted
    assert missing == [], f"missing {len(missing)}: {missing[:10]}"
    assert unexpected == [], f"unexpected {len(unexpected)}: {unexpected[:10]}"


def test_unet_forward_parity(converted):
    import torch

    net, model, params, _, _ = converted
    rng = np.random.default_rng(0)
    x = rng.normal(size=(T, 8, H, W)).astype(np.float32)
    ts = rng.normal(size=(T,)).astype(np.float32)
    ctx = rng.normal(size=(T, 1, 24)).astype(np.float32)
    y = rng.normal(size=(T, 26)).astype(np.float32)
    ioi = np.zeros((1, T), dtype=np.float32)

    with torch.no_grad():
        ref = net(torch.from_numpy(x), torch.from_numpy(ts),
                  context=torch.from_numpy(ctx), y=torch.from_numpy(y),
                  num_video_frames=T,
                  image_only_indicator=torch.from_numpy(ioi)).numpy()

    out = jax.jit(
        lambda p, *a: model.apply(p, *a, num_video_frames=T,
                                  image_only_indicator=jnp.asarray(ioi))
    )({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
      jnp.asarray(ts), jnp.asarray(ctx), jnp.asarray(y))
    out = np.asarray(out).transpose(0, 3, 1, 2)

    assert ref.shape == out.shape
    assert np.abs(ref).max() > 1e-3  # non-vacuous target (zero convs filled)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)


TINY_DD = dict(
    ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16],
    z_channels=4, double_z=True, in_channels=3, out_ch=3, resolution=32,
    dropout=0.0, attn_type="vanilla",
)


def test_vae_encoder_parity():
    import torch

    from tests.ref_oracle import get_reference_vae
    from gcd_tpu.models.vae import Encoder

    RefEncoder, _ = get_reference_vae()
    torch.manual_seed(1)
    ref = RefEncoder(**TINY_DD).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = Encoder(**{k: v for k, v in TINY_DD.items() if k != "attn_type"})
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    )["params"]
    params, missing, used = convert_state_dict_to_params(sd, template)
    unexpected = sorted(set(sd) - set(used))
    assert missing == [], missing[:8]
    assert unexpected == [], unexpected[:8]

    x = np.random.default_rng(2).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = jax.jit(model.apply)({"params": params},
                               jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)


def test_video_decoder_parity():
    import torch

    from tests.ref_oracle import get_reference_vae
    from gcd_tpu.models.vae import VideoDecoder

    _, RefVideoDecoder = get_reference_vae()
    torch.manual_seed(3)
    ref = RefVideoDecoder(**TINY_DD, video_kernel_size=[3, 1, 1]).eval()
    fill_zero_params(ref, seed=103)  # time_stack out convs are zero_module'd
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = VideoDecoder(
        **{k: v for k, v in TINY_DD.items() if k != "attn_type"},
        video_kernel_size=[3, 1, 1])
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((4, 16, 16, 4)),
                           timesteps=2)
    )["params"]
    params, missing, used = convert_state_dict_to_params(sd, template)
    unexpected = sorted(set(sd) - set(used))
    assert missing == [], missing[:8]
    assert unexpected == [], unexpected[:8]

    z = np.random.default_rng(4).normal(size=(4, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(z), timesteps=2).numpy()
    out = jax.jit(lambda p, z: model.apply(p, z, timesteps=2))(
        {"params": params}, jnp.asarray(z.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)


def test_video_attn_block_parity():
    """VideoBlock, the temporal-attention block of the VideoDecoder's
    attn/"all" time modes (temporal_ae.py:110-178): spatial single-head attn,
    frame-position embedding, single-head temporal transformer (ff_in, no
    context), alpha merge weighting the spatial branch.

    Block-level rather than decoder-level because the reference's
    VideoDecoder cannot *construct* the non-default time modes at all:
    `_make_attn` calls `partialclass(make_time_attn, ...)` (temporal_ae.py
    :324-330), which tries to subclass the *function* `make_time_attn`
    (sgm/util.py:98-102) and raises TypeError — dead code upstream. This
    framework makes the modes usable; parity is asserted on the block."""
    import torch

    from tests.ref_oracle import setup_reference_imports
    from gcd_tpu.models.vae import VideoAttnBlock

    assert setup_reference_imports()
    from sgm.modules.autoencoding.temporal_ae import VideoBlock

    torch.manual_seed(5)
    c, b, t, hh, ww = 32, 2, 3, 8, 8
    ref = VideoBlock(in_channels=c, alpha=0.0, merge_strategy="learned").eval()
    fill_zero_params(ref, seed=105)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = VideoAttnBlock(alpha=0.0, merge_strategy="learned")
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((b * t, hh, ww, c)), t)
    )["params"]
    params, missing, used = convert_state_dict_to_params(sd, template)
    unexpected = sorted(set(sd) - set(used))
    assert missing == [], missing[:8]
    assert unexpected == [], unexpected[:8]

    x = np.random.default_rng(6).normal(
        size=(b * t, c, hh, ww)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), timesteps=t).numpy()
    out = jax.jit(lambda p, z: model.apply(p, z, t))(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=3e-4)


@pytest.mark.parametrize("time_mode", ["all", "attn-only"])
def test_video_decoder_attn_time_modes_run(time_mode):
    """Decoder-level smoke for the attn time modes (reference cannot build
    these — see test_video_attn_block_parity): shapes, finiteness, and that
    "attn-only" has no temporal conv params while "all" has both."""
    from gcd_tpu.models.vae import VideoDecoder

    model = VideoDecoder(
        **{k: v for k, v in TINY_DD.items() if k != "attn_type"},
        video_kernel_size=[3, 1, 1], time_mode=time_mode)
    z = jnp.zeros((4, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), z, timesteps=2)
    flat = {"/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    has_time_attn = any("time_mix_block" in p for p in flat)
    has_time_conv = any("time_stack" in p or "time_mix_conv" in p
                        for p in flat)
    assert has_time_attn
    assert has_time_conv == (time_mode == "all")
    out = jax.jit(lambda p, zz: model.apply(p, zz, timesteps=2))(params, z)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
