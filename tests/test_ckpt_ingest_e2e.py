"""End-to-end torch-checkpoint ingest: a real torch.save()d .ckpt in the
reference's key layout (``{"state_dict": {...}, "global_step": N}``, LitEma
shadow buffers under ``model_ema.`` with dot-stripped names — sgm/modules/
ema.py, diffusion.py:191-219) loaded through
``DiffusionEngine.load_torch_checkpoint``.

The converter pieces (key mapping, tensor reorientation, EMA recovery, CLIP
renames) each have unit/parity tests; this test drives the whole file-to-
param-tree path the way `scripts/convert_ckpt.py` and eval do, asserting
zero missing keys on a complete checkpoint and that the EMA shadow weights —
not the live ones — land in the UNet tree (ema_scope('Testing') semantics,
reference scripts/test.py:1012)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from gcd_tpu.io.convert import (  # noqa: E402
    flax_path_to_torch_key,
    synthesize_reference_state_dict,
    _iter_tree_paths,
)
from gcd_tpu.utils.config import instantiate_from_config  # noqa: E402
from tests.helpers import tiny_engine_config  # noqa: E402


def _synth_state_dict(params, rng):
    """Complete reference-layout state dict (gcd_tpu.io.convert helper) with
    heavy perturbation so loaded-from-ckpt differs from template fallback."""
    return synthesize_reference_state_dict(params, rng, dtype=np.float32,
                                           perturb=1.0)


def test_torch_ckpt_ingest_with_ema_overlay(tmp_path, capsys):
    cfg = tiny_engine_config()
    cfg["params"]["use_ema"] = False
    cfg["params"]["ckpt_has_ema"] = True
    engine = instantiate_from_config(cfg)
    params = jax.jit(
        lambda k: engine.init_params(k, img_hw=(32, 48), t=3)
    )(jax.random.PRNGKey(0))

    rng = np.random.default_rng(7)
    sd = _synth_state_dict(params, rng)
    n_unet = sum(1 for k in sd if k.startswith("model.diffusion_model."))
    assert n_unet > 20  # the tiny UNet is small but not trivial

    # LitEma shadow buffers: live value + 1, keyed with dots stripped.
    for k in [k for k in sd if k.startswith("model.diffusion_model.")]:
        flat = k[len("model."):].replace(".", "")
        sd["model_ema." + flat] = sd[k] + 1.0
    sd["model_ema.num_updates"] = np.asarray(123, np.int64)
    sd["model_ema.decay"] = np.asarray(0.9999, np.float32)

    path = tmp_path / "synthetic_gcd.ckpt"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
         "global_step": 123},
        path,
    )

    loaded = engine.load_torch_checkpoint(str(path), params)
    out = capsys.readouterr().out
    assert "with 0 missing" in out, out
    assert f"Using {n_unet} EMA shadow tensors" in out, out
    # Every live key consumed: the only unexpected keys are the model_ema.*
    # originals (the converter consumes their re-keyed overlay forms).
    n_ema_keys = sum(1 for k in sd if k.startswith("model_ema."))
    assert f"and {n_ema_keys} unexpected" in out, out

    # The UNet must get the EMA shadow values (live + 1), not the live ones.
    # Check without re-deriving layouts: reload the same ckpt with
    # ckpt_has_ema=False and compare — every UNet leaf must differ by exactly
    # the EMA offset of 1.0, and the frozen towers must be identical.
    engine.ckpt_has_ema = False
    base = engine.load_torch_checkpoint(str(path), params, verbose=False)
    engine.ckpt_has_ema = True

    n_checked = 0
    for (pa, la), (pb, lb) in zip(
        _iter_tree_paths(loaded["model"]), _iter_tree_paths(base["model"])
    ):
        assert pa == pb
        if flax_path_to_torch_key(pa) is None:
            continue
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb) + 1.0, rtol=0, atol=1e-6)
        n_checked += 1
    assert n_checked == n_unet

    for (pa, la), (pb, lb) in zip(
        _iter_tree_paths(loaded["first_stage"]),
        _iter_tree_paths(base["first_stage"]),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
