"""Shared tiny full-stack config for engine-level tests (re-export)."""

from gcd_tpu.utils.testing import TINY_DD, CTX_DIM, ADM, AUX, tiny_engine_config  # noqa: F401
