"""Temporal (Bahdanau / additive soft) attention over the frame axis.

Equivalent computation to the reference's TemporalAttention
(reference src/models/temporal_attention.py:6-33):

    energies_t = w . tanh(W h + U v_t + b)
    weights    = softmax_t(energies)           (masked positions -> -inf)
    context    = sum_t weights_t * v_t

TPU-first differences:
- the key projection ``U v_t`` is *time-invariant*, so it is computed once per
  sequence (one [B,T,F]x[F,A] matmul on the MXU) and reused by every decode
  step — the reference recomputes it for every generated token
- everything is expressed as batched matmuls; `vmap`/scan compose around it
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvc_tpu.models.initializers import linear_params


def init_attention(key, hidden_size: int, feature_size: int, bottleneck_size: int, dtype=jnp.float32):
    kW, kU, kw = jax.random.split(key, 3)
    return {
        "W": linear_params(kW, hidden_size, bottleneck_size, bias=False, dtype=dtype)["w"],
        "U": linear_params(kU, feature_size, bottleneck_size, bias=False, dtype=dtype)["w"],
        # The reference initializes the shared bias to ones
        # (src/models/temporal_attention.py:16).
        "b": jnp.ones((bottleneck_size,), dtype),
        "w": linear_params(kw, bottleneck_size, 1, bias=False, dtype=dtype)["w"][:, 0],
    }


def precompute_keys(params, feats: jnp.ndarray) -> jnp.ndarray:
    """[B, T, F] -> [B, T, A]; hoisted out of the decode scan."""
    return feats @ params["U"].astype(feats.dtype)


def masked_softmax(energies: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Softmax with exact zeros at masked positions.  Rows with no valid
    position yield all-zero weights instead of NaN — this is what makes
    batch-padding rows (feat_mask all False) inert in the loss."""
    if mask is None:
        return jax.nn.softmax(energies, axis=axis)
    neg_inf = jnp.asarray(-jnp.inf, energies.dtype)
    e = jnp.where(mask, energies, neg_inf)
    m = jnp.max(e, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    unnorm = jnp.where(mask, jnp.exp(e - m), 0.0)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, jnp.finfo(energies.dtype).tiny)


def attend(
    params,
    hidden: jnp.ndarray,            # [B, H]
    feats: jnp.ndarray,             # [B, T, F]
    keys: Optional[jnp.ndarray] = None,   # [B, T, A] precomputed U@feats
    mask: Optional[jnp.ndarray] = None,   # [B, T] bool, True = attendable
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (context [B, F], weights [B, T])."""
    if keys is None:
        keys = precompute_keys(params, feats)
    d = keys.dtype
    query = hidden.astype(d) @ params["W"].astype(d)  # [B, A]
    energies = jnp.tanh(query[:, None, :] + keys + params["b"].astype(d)) @ params["w"].astype(d)
    weights = masked_softmax(energies, mask, axis=1)
    context = jnp.einsum("bt,btf->bf", weights, feats)
    return context, weights
