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
