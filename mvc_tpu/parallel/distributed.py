"""Multi-process (multi-host) bring-up helpers.

One call wires a jax.distributed process group from env vars or explicit
arguments, and the companions hand back the pieces the rest of the framework
needs: a global mesh over all devices and the per-process data-shard
coordinates for DataLoader(process_index=..., process_count=...).

Single-process remains the default everywhere — calling ``initialize`` is
only needed on real multi-host slices.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed (idempotent); returns
    (process_index, process_count) for the data loader.

    Falls back to the conventional env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); with none present this is a
    single-process no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def data_shard() -> Tuple[int, int]:
    """(process_index, process_count) for DataLoader sharding."""
    return jax.process_index(), jax.process_count()


def make_global_mesh(dp: int = -1, tp: int = 1):
    """Mesh over ALL processes' devices (jax.devices() is global after
    jax.distributed.initialize)."""
    from mvc_tpu.parallel.mesh import make_mesh

    return make_mesh(dp=dp, tp=tp, devices=jax.devices())
