"""Kernel dispatch flags: defaults, thread-local overrides, env precedence.

Replaces round 1's scattered env-var kill switches (VERDICT.md Next-round #9,
ADVICE.md trainer env-mutation finding).
"""

import os
import threading

import pytest

from gcd_tpu.ops.dispatch import kernel_enabled, kernel_flags


def test_defaults():
    assert kernel_enabled("flash")
    assert kernel_enabled("fused_mlp")
    assert kernel_enabled("tattn_pallas")
    assert not kernel_enabled("fused_gn_conv")
    assert not kernel_enabled("exact_gelu")


def test_override_nesting_and_restore():
    with kernel_flags(tattn_pallas=False):
        assert not kernel_enabled("tattn_pallas")
        assert kernel_enabled("flash")  # untouched flags keep defaults
        with kernel_flags(tattn_pallas=True, flash=False):
            assert kernel_enabled("tattn_pallas")
            assert not kernel_enabled("flash")
        assert not kernel_enabled("tattn_pallas")
    assert kernel_enabled("tattn_pallas")


def test_env_var_takes_precedence(monkeypatch):
    monkeypatch.setenv("GCD_TATTN_PALLAS", "1")
    with kernel_flags(tattn_pallas=False):
        assert kernel_enabled("tattn_pallas")
    monkeypatch.setenv("GCD_FLASH", "0")
    with kernel_flags(flash=True):
        assert not kernel_enabled("flash")
    # empty string = unset
    monkeypatch.setenv("GCD_FLASH", "")
    assert kernel_enabled("flash")


def test_unknown_flag_rejected():
    with pytest.raises(ValueError, match="unknown kernel flag"):
        with kernel_flags(bogus=True):
            pass


def test_thread_isolation():
    """An override on one thread must be invisible to another (the round-1
    bug: os.environ mutation leaked into concurrent traces)."""
    results = {}
    barrier = threading.Barrier(2)

    def holder():
        with kernel_flags(tattn_pallas=False):
            barrier.wait()      # override active...
            barrier.wait()      # ...while the peer reads
        results["holder"] = kernel_enabled("tattn_pallas")

    def reader():
        barrier.wait()
        results["reader"] = kernel_enabled("tattn_pallas")
        barrier.wait()

    t1 = threading.Thread(target=holder)
    t2 = threading.Thread(target=reader)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert results["reader"] is True
    assert results["holder"] is True


def test_no_env_leak_from_trainer_path():
    """The trainer context must not write to os.environ."""
    assert os.environ.get("GCD_TATTN_PALLAS") is None
    with kernel_flags(tattn_pallas=False):
        assert os.environ.get("GCD_TATTN_PALLAS") is None


def test_program_policy_bundle_refinement():
    """PERF_BATCH v2 (round 5): the extent-112 Pallas-stats patch applies
    ONLY to programs compiled without the bundle-aware fusion cost model;
    with the bundle option the pathology does not form and the patch costs
    (4.84 vs 4.58 f/s measured)."""
    from gcd_tpu.ops import dispatch

    bundle = {dispatch._BUNDLE_FLAG: "true"}
    assert dispatch.program_flag_overrides(112, bundle) == {}
    assert dispatch.program_flag_overrides(112, None) == {
        "gn_stats_pallas": True}
    assert dispatch.program_flag_overrides(112) == {"gn_stats_pallas": True}
    assert dispatch.program_flag_overrides(56, bundle) == {}
    assert dispatch.program_flag_overrides(224, bundle) == {}


def test_default_compiler_options_extent_rule():
    """The bundle flag ships for extents < 224 and is dropped at >= 224
    (measured HBM compile-OOM, PERF_BATCH v2 bundle_oom_224); GCD_XLA_OPTS
    merges on top; off-TPU the helper returns None."""
    from unittest import mock

    from gcd_tpu.ops import attention, dispatch

    # This suite runs on CPU: the real backend check must say None.
    assert dispatch.default_compiler_options(112) is None

    with mock.patch.object(attention, "_is_tpu_backend", lambda: True):
        with mock.patch.dict(os.environ, {}, clear=False):
            os.environ.pop("GCD_XLA_OPTS", None)
            os.environ.pop("GCD_DEFAULT_XLA_OPTS", None)
            o = dispatch.default_compiler_options(112)
            assert o[dispatch._BUNDLE_FLAG] == "true"
            o224 = dispatch.default_compiler_options(224) or {}
            assert dispatch._BUNDLE_FLAG not in o224
            assert dispatch._BUNDLE_FLAG in dispatch.default_compiler_options()
            os.environ["GCD_DEFAULT_XLA_OPTS"] = "0"
            assert dispatch.default_compiler_options(112) is None
            del os.environ["GCD_DEFAULT_XLA_OPTS"]
            os.environ["GCD_XLA_OPTS"] = (
                dispatch._BUNDLE_FLAG + "=false,xla_tpu_rwb_fusion=false")
            o = dispatch.default_compiler_options(112)
            assert o[dispatch._BUNDLE_FLAG] == "false"  # user wins
            assert o["xla_tpu_rwb_fusion"] == "false"
            del os.environ["GCD_XLA_OPTS"]
