"""Kernel dispatch: opt into Pallas kernels for the decode hot path with
MVC_PALLAS=1 (TPU backends only).  Default is the XLA path — identical
numerics are asserted in tests/test_pallas.py either way."""

from __future__ import annotations

import os
from functools import lru_cache


@lru_cache(maxsize=1)
def use_pallas() -> bool:
    if os.environ.get("MVC_PALLAS", "0") != "1":
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False
