"""Checkpointing.

Improves on the reference (reference src/train.py:43-80): optimizer and
scheduler state ARE saved (the reference silently restarts Adam on resume),
writes are atomic (tmp + rename), and the dual model's parameter tree keeps
the reference's key layout (v_decoder / a_decoder / v_reconstructor /
a_reconstructor) so converted torch checkpoints line up.

Format: a pickle of numpy-ified pytrees — host-portable, no framework
coupling.  ``save_best``/triggers live in the Trainer.
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Atomic write of {epoch, params, opt_state, scheduler, history, ...}."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    host = {k: _to_host(v) if k in ("params", "opt_state") else v for k, v in payload.items()}
    fd, tmp = tempfile.mkstemp(dir=d or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    """Returns the payload or None when the file is absent/corrupt
    (the reference swallows load errors and trains fresh —
    src/train.py:45-62)."""
    if not os.path.isfile(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception as e:
        print(f"Error loading from checkpoint: {path} ({e}).\nUsing default parameters...")
        return None


def restore_params_like(template, host_params):
    """Device-put host arrays with the dtypes/structure of ``template``."""
    return jax.tree.map(
        lambda t, h: jax.numpy.asarray(h, dtype=t.dtype), template, host_params
    )
