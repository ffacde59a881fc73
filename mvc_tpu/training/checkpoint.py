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
    """Device trees -> numpy.  All D2H copies are started before any is
    awaited — off-host (tunnel) transfers overlap instead of paying a
    round-trip per leaf (measured ~1.5x on axon)."""
    leaves, treedef = jax.tree.flatten(tree)
    for leaf in leaves:
        if hasattr(leaf, "copy_to_host_async"):
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass
    return jax.tree.unflatten(treedef, [np.asarray(x) for x in leaves])


class AsyncSaver:
    """Background checkpoint writer.

    ``submit`` snapshots the device state with on-device copies (safe against
    the train loop's buffer donation) and hands the D2H fetch + pickle to a
    worker thread, so multi-hundred-MB checkpoint transfers overlap training
    instead of stalling the epoch.  Single-process only (multi-process runs
    need a process-0 gather first)."""

    def __init__(self):
        self._thread = None
        self._error = None

    def wait(self) -> None:
        """Joins the in-flight write; re-raises any failure from the worker
        (a checkpoint silently missing on disk is worse than a loud stop —
        a later resume would train from stale or default parameters)."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

    def submit(self, jobs) -> None:
        """jobs: list of (path, payload) where payloads may share device
        trees; each device leaf is snapshotted once."""
        import threading

        self.wait()

        snapped = {}

        def snap(tree):
            def one(x):
                if isinstance(x, jax.Array):
                    key = id(x)
                    if key not in snapped:
                        snapped[key] = jax.numpy.copy(x)
                    return snapped[key]
                return x
            return jax.tree.map(one, tree)

        prepared = [
            (path, {k: snap(v) if k in ("params", "opt_state") else v
                    for k, v in payload.items()})
            for path, payload in jobs
        ]

        def work():
            try:
                for path, payload in prepared:
                    save_checkpoint(path, payload)
            except BaseException as e:       # surfaced by the next wait()
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()


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
