"""Compose the fused Pallas decode/beam kernels with a GSPMD device mesh.

The fused kernels (ops/pallas_decode.py, ops/pallas_dual_greedy.py,
ops/pallas_beam.py) are whole-batch ``pallas_call``s — handed dp-sharded
inputs inside a jitted predict, XLA would gather the whole batch onto one
device before launching the kernel, silently destroying the data-parallel
win.  Decode and beam search are embarrassingly batch-parallel (the
reference's beam hot loop, src/models/features_captioning.py:131-228, has no
cross-clip coupling), so the right composition is ``jax.shard_map`` over the
mesh's batch axes: every device runs the fused kernel on its own batch shard,
no collectives in the hot loop at all.

Sharding layout:
- features / frame mask / token output: batch axis over ``batch_axes(mesh,B)``
  — all mesh axes when the batch divides ``mesh.size`` (a tp axis is
  repurposed as extra batch parallelism at predict time; decode has no
  sharded matmul to feed it), else the dp axis alone
- decoder parameters: replicated (``P()``).  A tp-sharded vocab table is
  all-gathered ONCE per predict call by the reshard jit inserts at the
  shard_map boundary — the kernels keep whole-vocab tiles streaming from the
  device-local HBM copy
- when the batch divides neither -> ``batch_axes`` returns None and the
  dispatch sites fall back to the XLA scan path, which GSPMD shards freely
  (never silently replicate the kernel)

Interpret-mode token parity of the sharded kernels vs the unsharded XLA scan
is asserted on the 8-virtual-device CPU mesh in tests/test_pallas_sharded.py;
``__graft_entry__.dryrun_multichip`` executes a sharded beam predict as part
of the multi-chip dryrun.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def batch_axes(mesh: Optional[Mesh], batch_size: int) -> Optional[Tuple[str, ...]]:
    """Mesh axes to shard a kernel batch over.

    Returns ``()`` when no (multi-device) mesh is active — call the kernel
    directly; a tuple of axis names when the batch divides them — wrap in
    shard_map; ``None`` when the batch divides neither all axes nor dp —
    the caller must fall back to the XLA path.
    """
    if mesh is None or mesh.size <= 1:
        return ()
    names = tuple(mesh.axis_names)
    if batch_size % mesh.size == 0:
        return names
    if "dp" in names:
        dp = mesh.shape["dp"]
        if dp > 1 and batch_size % dp == 0:
            return ("dp",)
    return None


def axes_size(mesh: Optional[Mesh], axes: Optional[Tuple[str, ...]]) -> int:
    if mesh is None or not axes:
        return 1
    return math.prod(mesh.shape[a] for a in axes)


def sharded_decode(
    mesh: Mesh,
    axes: Tuple[str, ...],
    kernel: Callable,                 # (params, feats_list, feat_mask) -> tokens
    params,                           # pytree, replicated into every shard
    feats_list: Sequence[jnp.ndarray],
    feat_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Run a fused decode/beam kernel per batch shard under shard_map.

    ``kernel`` must close over all static configuration (tile sizes, widths,
    dtypes) and take exactly (params, feats_list, feat_mask); each shard sees
    the local ``[B/prod(axes), T, F]`` features and returns local ``[b, L]``
    tokens, reassembled to the global batch-sharded ``[B, L]``.
    """
    B, T = feats_list[0].shape[0], feats_list[0].shape[1]
    if feat_mask is None:
        feat_mask = jnp.ones((B, T), bool)
    bspec = P(axes)
    pspec = jax.tree.map(lambda _: P(), params)

    def local(params, feats_list, mask):
        return kernel(params, feats_list, mask)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec, [bspec] * len(feats_list), bspec),
        out_specs=bspec,
        # pallas_call's out_shape carries no varying-mesh-axes annotation, so
        # the vma checker can't see through it; the manual specs above are
        # the whole contract (pure batch parallelism, no collectives).
        check_vma=False,
    )
    return fn(params, list(feats_list), feat_mask)
