"""Kernel dispatch: opt into Pallas kernels for the decode hot path with
``MVC_PALLAS=1`` or programmatically via :func:`enable_pallas` (TPU backends
only).  Default is the XLA path — identical numerics are asserted in
tests/test_pallas.py either way."""

from __future__ import annotations

import os
from functools import lru_cache

_override: bool | None = None       # enable_pallas() beats the env var


def enable_pallas(on: bool = True) -> None:
    """Programmatic switch (used by train.py --pallas and library callers);
    overrides the MVC_PALLAS env var."""
    global _override
    _override = bool(on)


@lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_pallas() -> bool:
    if _override is not None:
        return _override and _on_tpu()
    return os.environ.get("MVC_PALLAS", "0") == "1" and _on_tpu()
