"""Kernel dispatch: opt into Pallas kernels for the decode hot path with
``MVC_PALLAS=1`` or programmatically via :func:`enable_pallas` (TPU backends
only).  Default is the XLA path — identical numerics are asserted in
tests/test_pallas.py either way."""

from __future__ import annotations

import os
from functools import lru_cache

_override: bool | None = None       # enable_pallas() beats the env var
_mesh = None                        # active device mesh (set by the trainer)


def enable_pallas(on: bool = True) -> None:
    """Programmatic switch (used by train.py --pallas and library callers);
    overrides the MVC_PALLAS env var."""
    global _override
    _override = bool(on)


def set_mesh(mesh) -> None:
    """Register the active device mesh so the Pallas dispatch sites shard
    the fused kernels over it (ops/sharded.py) instead of letting GSPMD
    gather a dp-sharded batch onto one device.  The trainer calls this when
    constructed with a mesh; pass None to clear."""
    global _mesh
    _mesh = mesh


def active_mesh():
    return _mesh


@lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def interpret_mode() -> bool:
    """MVC_PALLAS_INTERPRET=1 runs the fused kernels through the Pallas
    interpreter — the dispatch sites pass ``interpret=True`` and the TPU
    backend requirement is waived, so the COMPLETE dispatch path (gate,
    shard_map composition, kernel) is exercisable in CPU tests."""
    return os.environ.get("MVC_PALLAS_INTERPRET", "0") == "1"


def use_pallas() -> bool:
    on = (_override if _override is not None
          else os.environ.get("MVC_PALLAS", "0") == "1")
    return on and (_on_tpu() or interpret_mode())
