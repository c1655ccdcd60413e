"""FID InceptionV3 (gcd_tpu/models/inception.py; reference
sgm/modules/encoders/modules.py:211-229 wrapping pytorch-fid)."""

import numpy as np
import jax
import jax.numpy as jnp

from gcd_tpu.models.inception import (
    InceptionV3,
    _avg_pool_no_pad,
    convert_fid_inception_state_dict,
)


def test_avg_pool_no_pad_matches_manual():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 2)),
                    jnp.float32)
    got = np.asarray(_avg_pool_no_pad(x))
    xn = np.asarray(x)
    # corner (0,0): 2x2 valid window of the padded 3x3
    want_corner = xn[0, :2, :2, :].mean(axis=(0, 1))
    np.testing.assert_allclose(got[0, 0, 0], want_corner, rtol=1e-5)
    # center (1,1): full 3x3 window
    want_center = xn[0, :3, :3, :].mean(axis=(0, 1))
    np.testing.assert_allclose(got[0, 1, 1], want_center, rtol=1e-5)


def test_inception_shapes_and_blocks():
    model = InceptionV3(output_blocks=(0, 1, 2, 3), resize_input=True,
                        normalize_input=True)
    x = jnp.zeros((2, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert [o.shape[-1] for o in outs] == [64, 192, 768, 2048]
    # 299 input: block0 35x35? (torchvision: 73x73 after block0, 35 after b1)
    assert outs[0].shape[1] == 73 and outs[1].shape[1] == 35
    assert outs[2].shape[1] == 17
    assert outs[3].shape[1:3] == (1, 1)

    # default single-block output squeezes to (N, 2048) like the reference
    single = InceptionV3()
    v1 = jax.jit(single.init)(jax.random.PRNGKey(0), x)
    pooled = single.apply(v1, x)
    assert pooled.shape == (2, 2048)
    assert np.isfinite(np.asarray(pooled)).all()


def test_fid_state_dict_name_map_roundtrip():
    """Every flax param/batch-stat maps to exactly one pytorch-fid key."""
    model = InceptionV3(output_blocks=(3,))
    x = jnp.zeros((1, 32, 32, 3))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x))

    # synthesize a torch-shaped state dict from the template via the same
    # name map, then convert back and require zero missing keys.
    from gcd_tpu.io.convert import _iter_tree_paths

    sd = {}
    for col in ("params", "batch_stats"):
        for path, leaf in _iter_tree_paths(dict(template)[col]):
            segs = list(path)
            leafname = segs.pop()
            base = ".".join(segs)
            tname = {"kernel": "weight", "scale": "weight", "bias": "bias",
                     "mean": "running_mean", "var": "running_var"}[leafname]
            shape = tuple(leaf.shape)
            if leafname == "kernel":
                shape = (shape[3], shape[2], shape[0], shape[1])  # OIHW
            sd[f"{base}.{tname}"] = np.zeros(shape, np.float32)

    variables, missing = convert_fid_inception_state_dict(sd, dict(template))
    assert missing == [], missing[:5]
    # expected key style present
    assert any(k.startswith("Mixed_5b.branch1x1.conv.weight") for k in sd)
    assert any(k.endswith(".bn.running_var") for k in sd)
