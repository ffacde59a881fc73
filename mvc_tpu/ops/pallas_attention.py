"""Fused additive (Bahdanau) attention energies + masked softmax as a Pallas
TPU kernel.

The fusion win: the [B, T, A] tanh activation never leaves VMEM — the XLA
fallback (mvc_tpu.models.attention.attend) materializes it in HBM between the
add, tanh, and energy-projection ops.  The kernel computes

    weights = masked softmax_T( tanh(q + K + b) @ w )     # [TB, T]

with 2-D dots only (Mosaic cannot lower batched dot_generals); the cheap
context matmul ``einsum(bt,btf->bf)`` stays in XLA where the MXU batches it
natively.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_weights_kernel(q_ref, keys_ref, w_ref, b_ref, mask_ref, weights_ref):
    """Refs (TB = batch tile):
      q:    [TB, A]    query projections (h @ W)
      keys: [TB, T, A] precomputed U @ feats
      w:    [A, 1]     energy vector
      b:    [1, A]     shared bias
      mask: [TB, T]    int32 (1 = attendable)
      weights: [TB, T] out (f32)
    """
    q = q_ref[:]
    keys = keys_ref[:]
    tb, t, a = keys.shape
    act = jnp.tanh(q[:, None, :] + keys + b_ref[:])            # [TB, T, A]
    energies = jnp.dot(
        act.reshape(tb * t, a), w_ref[:], preferred_element_type=jnp.float32
    ).reshape(tb, t)                                           # [TB, T]
    mask = mask_ref[:] != 0
    neg_inf = jnp.asarray(-jnp.inf, energies.dtype)
    e = jnp.where(mask, energies, neg_inf)
    m = jnp.max(e, axis=1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    unnorm = jnp.where(mask, jnp.exp(e - m), 0.0)
    denom = jnp.maximum(jnp.sum(unnorm, axis=1, keepdims=True),
                        jnp.finfo(jnp.float32).tiny)
    weights_ref[:] = (unnorm / denom).astype(weights_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def attention_weights_pallas(
    params,
    hidden: jnp.ndarray,                 # [B, H]
    keys: jnp.ndarray,                   # [B, T, A] precomputed
    mask: Optional[jnp.ndarray] = None,  # [B, T] bool
    block_b: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, T] masked attention weights (fused energies + softmax)."""
    B, T, A = keys.shape
    dtype = keys.dtype

    q = hidden.astype(dtype) @ params["W"].astype(dtype)       # [B, A] (XLA)
    w = params["w"].astype(dtype).reshape(A, 1)
    b = params["b"].astype(dtype).reshape(1, A)
    mask_i = (mask if mask is not None else jnp.ones((B, T), bool)).astype(jnp.int32)

    tb = block_b if B % block_b == 0 else B
    grid = (B // tb,)

    return pl.pallas_call(
        _attention_weights_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, T, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * A,
            bytes_accessed=(B * T * A + B * (A + T)) * keys.dtype.itemsize,
            transcendentals=B * T * (A + 1),
        ),
    )(q, keys, w, b, mask_i)


def attend_pallas(
    params,
    hidden: jnp.ndarray,
    feats: jnp.ndarray,
    keys: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    block_b: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused drop-in for attention.attend (with precomputed keys):
    returns (context [B, F], weights [B, T])."""
    weights = attention_weights_pallas(
        params, hidden, keys, mask, block_b=block_b, interpret=interpret
    )
    context = jnp.einsum("bt,btf->bf", weights.astype(feats.dtype), feats)
    return context, weights
