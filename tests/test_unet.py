"""VideoUNet shape and behavior tests (tiny config, all jitted — eager dispatch
is pathologically slow on this host)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gcd_tpu.models.unet import VideoUNet

TINY = dict(
    in_channels=8,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=[2, 1],
    channel_mult=[1, 2],
    num_head_channels=16,
    transformer_depth=1,
    context_dim=24,
    use_linear_in_transformer=True,
    extra_ff_mix_layer=True,
    use_spatial_context=True,
    merge_strategy="learned_with_images",
    video_kernel_size=[3, 1, 1],
    num_classes="sequential",
    adm_in_channels=20,
    aux_emb_dim=6,
)

T = 3


def _make_inputs(key, b=1, t=T, h=16, w=16):
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (b * t, h, w, TINY["in_channels"]))
    timesteps = jax.random.normal(ks[1], (b * t,))
    context = jax.random.normal(ks[2], (b * t, 1, TINY["context_dim"]))
    y = jax.random.normal(ks[3], (b * t, TINY["adm_in_channels"] + TINY["aux_emb_dim"]))
    ioi = jnp.zeros((b, t))
    return x, timesteps, context, y, ioi


def _init_and_apply(model, key, inputs):
    x, ts, ctx, y, ioi = inputs

    @jax.jit
    def go(key):
        params = model.init(key, x, ts, ctx, y, num_video_frames=T,
                            image_only_indicator=ioi)
        out = model.apply(params, x, ts, ctx, y, num_video_frames=T,
                          image_only_indicator=ioi)
        return params, out

    return go(key)


def test_tiny_unet_forward_and_zero_init(key):
    model = VideoUNet(**TINY)
    inputs = _make_inputs(key)
    params, out = _init_and_apply(model, key, inputs)
    assert out.shape == (T, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # Final conv is zero-init => output must be exactly 0 at init.
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_remat_blocks_match_grads(key):
    """nn.remat-wrapped VideoResBlock / SpatialVideoTransformer (as used by
    use_checkpoint=True) must produce identical grads to the plain blocks.
    Kept at block granularity: grad-of-remat over the full UNet compiles for
    minutes on the CPU backend."""
    from flax import linen as nn
    from gcd_tpu.models.resblock import VideoResBlock
    from gcd_tpu.models.video_attention import SpatialVideoTransformer

    t = 2
    x = jax.random.normal(key, (2 * t, 8, 8, 32))
    emb = jax.random.normal(jax.random.fold_in(key, 1), (2 * t, 64))
    ctx = jax.random.normal(jax.random.fold_in(key, 2), (2 * t, 1, 24))
    ioi = jnp.zeros((2, t))

    res_plain = VideoResBlock(out_channels=32, video_kernel_size=[3, 1, 1],
                              merge_strategy="learned_with_images")
    res_ckpt = nn.remat(VideoResBlock, static_argnums=(4,))(
        out_channels=32, video_kernel_size=[3, 1, 1],
        merge_strategy="learned_with_images")
    attn_plain = SpatialVideoTransformer(
        n_heads=2, d_head=16, context_dim=24, use_spatial_context=True,
        use_linear=True, ff_in=True, merge_strategy="learned_with_images")
    attn_ckpt = nn.remat(SpatialVideoTransformer, static_argnums=(4,))(
        n_heads=2, d_head=16, context_dim=24, use_spatial_context=True,
        use_linear=True, ff_in=True, merge_strategy="learned_with_images")

    @jax.jit
    def res_grads(key):
        p = res_plain.init(key, x, emb, ioi, t)
        g1 = jax.grad(lambda p: (res_plain.apply(p, x, emb, ioi, t) ** 2).sum())(p)
        g2 = jax.grad(lambda p: (res_ckpt.apply(p, x, emb, ioi, t) ** 2).sum())(p)
        return g1, g2

    @jax.jit
    def attn_grads(key):
        p = attn_plain.init(key, x, ctx, None, t, ioi)
        g1 = jax.grad(lambda p: (attn_plain.apply(p, x, ctx, None, t, ioi) ** 2).sum())(p)
        g2 = jax.grad(lambda p: (attn_ckpt.apply(p, x, ctx, None, t, ioi) ** 2).sum())(p)
        return g1, g2

    for grads in (res_grads, attn_grads):
        g1, g2 = grads(key)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            # Remat recomputes the forward with a different fusion schedule, so
            # grads differ by float-reassociation noise (grows with the
            # channel-first GroupNorm stats, which XLA reassociates freely).
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-3)


def test_temporal_mixing_depends_on_frame_order(key):
    """Permuting frames must change per-frame outputs (frame-position embedding
    breaks time equivariance), verifying the (b s) t c rearrange is wired in."""
    model = VideoUNet(**TINY)
    x, ts, ctx, y, ioi = _make_inputs(key)
    perm = jnp.asarray([2, 0, 1])

    @jax.jit
    def go(key):
        params = model.init(key, x, ts, ctx, y, num_video_frames=T,
                            image_only_indicator=ioi)
        params = jax.tree_util.tree_map(lambda p: p + 0.01 * jnp.ones_like(p), params)
        out1 = model.apply(params, x, ts, ctx, y, num_video_frames=T,
                           image_only_indicator=ioi)
        out2 = model.apply(params, x[perm], ts, ctx, y, num_video_frames=T,
                           image_only_indicator=ioi)
        return out1, out2

    out1, out2 = go(key)
    assert not np.allclose(np.asarray(out2), np.asarray(out1)[np.asarray(perm)],
                           atol=1e-5)
