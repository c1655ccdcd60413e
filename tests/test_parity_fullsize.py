"""Full-size SVD conversion coverage: every parameter of the production-scale
reference models maps 1:1 to a flax leaf (keys + shapes), without materializing
the 1.5B-param weights (torch meta device + jax eval_shape)."""

import numpy as np
import pytest

from tests.ref_oracle import setup_reference_imports

pytestmark = pytest.mark.skipif(
    not setup_reference_imports(), reason="reference mount unavailable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gcd_tpu.io.convert import flax_path_to_torch_key  # noqa: E402

FULL_UNET = dict(
    adm_in_channels=768, num_classes="sequential", in_channels=8,
    out_channels=4, model_channels=320, attention_resolutions=[4, 2, 1],
    num_res_blocks=2, channel_mult=[1, 2, 4, 4], num_head_channels=64,
    use_linear_in_transformer=True, transformer_depth=1, context_dim=1024,
    extra_ff_mix_layer=True, use_spatial_context=True,
    merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
    aux_emb_dim=128,
)

FULL_DD = dict(
    double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
    ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
    dropout=0.0,
)


def _expected_torch_shape(flax_shape, kind):
    s = tuple(flax_shape)
    if kind == "linear_or_conv":
        if len(s) == 2:
            return (s[1], s[0])
        if len(s) == 4:  # HWIO -> OIHW
            return (s[3], s[2], s[0], s[1])
        if len(s) == 5:  # DHWIO -> OIDHW
            return (s[4], s[3], s[0], s[1], s[2])
    if kind == "mha_w":
        return (s[1], s[0])
    return s


def _iter_tree(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _iter_tree(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _check_coverage(torch_module_fn, flax_template):
    import torch

    with torch.device("meta"):
        ref = torch_module_fn()
    ref_shapes = {k: tuple(v.shape) for k, v in ref.state_dict().items()}

    mapped = {}
    for path, leaf in _iter_tree(flax_template):
        res = flax_path_to_torch_key(path)
        assert res is not None, path
        key, kind = res
        assert key not in mapped, f"duplicate mapping {key}"
        mapped[key] = _expected_torch_shape(leaf.shape, kind)

    missing = sorted(set(ref_shapes) - set(mapped))
    unexpected = sorted(set(mapped) - set(ref_shapes))
    assert missing == [], f"{len(missing)} missing, first: {missing[:8]}"
    assert unexpected == [], f"{len(unexpected)} unexpected: {unexpected[:8]}"
    for k in ref_shapes:
        assert mapped[k] == ref_shapes[k], (
            f"shape mismatch at {k}: flax->{mapped[k]} vs torch {ref_shapes[k]}")
    return len(ref_shapes)


@pytest.mark.slow
def test_full_unet_conversion_coverage():
    from tests.ref_oracle import get_reference_video_unet
    from gcd_tpu.models.unet import VideoUNet

    model = VideoUNet(**FULL_UNET)
    t = 2
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((t, 32, 48, 8)),
            jnp.zeros((t,)), jnp.zeros((t, 1, 1024)),
            jnp.zeros((t, 768 + 128)), num_video_frames=t,
            image_only_indicator=jnp.zeros((1, t)))
    )["params"]

    n = _check_coverage(
        lambda: get_reference_video_unet(
            **FULL_UNET, spatial_transformer_attn_type="softmax"),
        template)
    assert n > 1000  # ~1.5B params across >1000 tensors


@pytest.mark.slow
def test_full_vae_conversion_coverage():
    from tests.ref_oracle import get_reference_vae
    from gcd_tpu.models.vae import Encoder, VideoDecoder

    RefEncoder, RefVideoDecoder = get_reference_vae()

    enc = Encoder(**FULL_DD)
    template = jax.eval_shape(
        lambda: enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )["params"]
    _check_coverage(lambda: RefEncoder(**FULL_DD, attn_type="vanilla"),
                    template)

    dec = VideoDecoder(**FULL_DD, video_kernel_size=[3, 1, 1])
    template = jax.eval_shape(
        lambda: dec.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 4)),
                         timesteps=2)
    )["params"]
    _check_coverage(
        lambda: RefVideoDecoder(**FULL_DD, attn_type="vanilla",
                                video_kernel_size=[3, 1, 1]),
        template)
