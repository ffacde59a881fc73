"""Fused chunked-vocab CE + entropy: logits -> loss without the [L,B,V] stack.

The materializing train path (losses.py) computes per-decoder log-softmax over
the full vocab — at the production shapes the [L-1, B, V] f32 log-prob stacks
(one per decoder, plus their sum, plus the saved-for-backward residuals and
the backward's own [L-1, B, V] temporaries) dominate the step's HBM traffic
(BENCH_NOTES round 5).  This module computes the SAME two loss terms —

- NLL of gold tokens over non-PAD positions [1:] (reference
  src/losses.py:50-52,112: F.nll_loss(ignore_index=PAD) over log-softmaxed
  outputs; for the dual model the outputs are the SUM of the two decoders'
  log-softmaxes, reference src/models/captioning.py:260-264)
- the entropy regularizer over the fused word distribution (reference
  src/losses.py:12-17, vocab-axis orientation — the ``compat_batch_axis``
  bug-compat mode is NOT supported here; the trainer falls back)

— directly from the decoders' hidden states and vocab projections, streaming
the vocab dimension in tiles with an online-softmax merge.  Neither the
forward nor the backward ever materializes a [L-1, B, V] tensor in HBM: the
forward saves only per-position scalars (lse per stream, fused lse, entropy
integrand), and the backward recomputes each logits tile, forms its gradient
tile, and contracts it immediately into grad_h / grad_w.

Math (streams d = 1 or 2, per flattened position n, vocab v):
  l_d        = h_d @ w_d + b_d                 (compute dtype, cast to f32)
  u          = sum_d l_d                       (fused "logits")
  ce_row     = sum_d (l_d[gold] - lse(l_d))    == (sum_d log_softmax(l_d))[gold]
  b_row      = sum_v p_v (u_v - lse(u))        with p = softmax(u)
               (shift-invariant: softmax(sum_d log_softmax(l_d)) == softmax(u))
  ce  = -sum_n ce_row * pad_n / max(sum pad, 1)
  ent = -mean_cols( sum_rows b_row * pad )     (sample_mask-weighted col mean)

Backward (per tile, recomputed):
  d ce_row / d l_d,v = onehot_v - softmax(l_d)_v
  d b_row  / d l_d,v = p_v (u_v - lse(u) - b_row)        (same for every d)

Numerics: the tile GEMM is a column slice of the full projection (identical
per-element accumulation); the online logsumexp merge differs from the
one-pass jax.nn.log_softmax only in float summation order (last-ulps;
tests/test_fused_loss.py pins the tolerance).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mvc_tpu.config import PAD_ID

_NEG = -1e30  # finite -inf stand-in: exp() underflows to exactly 0.0


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_weights(outs: Sequence[dict], tile_v: int):
    """Pad each stream's [H, V] / [V] projection to Vp and stack V-tiles.

    Returns (w_tiles list of [nT, H, tV], b_tiles list of [nT, tV], V, Vp).
    """
    V = outs[0]["w"].shape[1]
    tV = min(int(tile_v), _round_up(V, 128))
    Vp = _round_up(V, tV)
    w_tiles, b_tiles = [], []
    for o in outs:
        w, b = o["w"], o["b"]
        assert w.shape[1] == V, "streams must share the vocab size"
        wp = jnp.pad(w, ((0, 0), (0, Vp - V)))
        bp = jnp.pad(b, (0, Vp - V))
        n_t = Vp // tV
        w_tiles.append(wp.reshape(w.shape[0], n_t, tV).transpose(1, 0, 2))
        b_tiles.append(bp.reshape(n_t, tV))
    return w_tiles, b_tiles, V, Vp, tV


def _tile_logits(h2, w_t, b_t, valid, cdtype):
    """One stream's f32 logits tile [N, tV]; invalid (padding) columns -> _NEG."""
    l = (h2 @ w_t.astype(cdtype) + b_t.astype(cdtype)).astype(jnp.float32)
    return jnp.where(valid[None, :], l, _NEG)


def _merge_lse(m, s1, m_t, s1_t):
    m_new = jnp.maximum(m, m_t)
    s1_new = s1 * jnp.exp(m - m_new) + s1_t * jnp.exp(m_t - m_new)
    return m_new, s1_new


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_rows(h_list, outs, gold, cdtype_name: str, tile_v: int, n_streams: int):
    """Per-position (ce_row, b_row), both [N] f32.

    h_list: tuple of [N, H_d] f32 hidden states (one per stream)
    outs:   tuple of {"w": [H_d, V], "b": [V]} projections (compute dtype)
    gold:   [N] int32 gold token ids
    """
    out = _fused_rows_fwd(h_list, outs, gold, cdtype_name, tile_v, n_streams)
    return out[0]


def _fused_rows_fwd(h_list, outs, gold, cdtype_name, tile_v, n_streams):
    cdtype = jnp.dtype(cdtype_name)
    w_tiles, b_tiles, V, Vp, tV = _tile_weights(outs, tile_v)
    N = gold.shape[0]
    h2 = [h.astype(cdtype) for h in h_list]
    gold = gold.astype(jnp.int32)

    def body(carry, xs):
        off, w_ts, b_ts = xs[0], xs[1], xs[2]
        (ms, s1s, picks, m_u, s1_u, s2_u) = carry
        col = off + jax.lax.iota(jnp.int32, tV)
        valid = col < V
        loc = jnp.clip(gold - off, 0, tV - 1)
        in_tile = (gold >= off) & (gold < off + tV)
        u = jnp.zeros((N, tV), jnp.float32)
        new_ms, new_s1s, new_picks = [], [], []
        for d in range(n_streams):
            l = _tile_logits(h2[d], w_ts[d], b_ts[d], valid, cdtype)
            u = u + l
            m_t = jnp.max(l, axis=-1)
            s1_t = jnp.sum(jnp.exp(l - m_t[:, None]), axis=-1)
            m_new, s1_new = _merge_lse(ms[d], s1s[d], m_t, s1_t)
            pick_t = jnp.take_along_axis(l, loc[:, None], axis=1)[:, 0]
            new_ms.append(m_new)
            new_s1s.append(s1_new)
            new_picks.append(picks[d] + jnp.where(in_tile, pick_t, 0.0))
        # fused-distribution stats (entropy): online m/s1 plus the first
        # moment s2 = sum exp(u - m) * (u - m), rescaled on each merge
        m_t = jnp.max(u, axis=-1)
        e = jnp.exp(u - m_t[:, None])
        s1_t = jnp.sum(e, axis=-1)
        s2_t = jnp.sum(e * (u - m_t[:, None]), axis=-1)
        m_new = jnp.maximum(m_u, m_t)
        a, a_t = jnp.exp(m_u - m_new), jnp.exp(m_t - m_new)
        s1_new = s1_u * a + s1_t * a_t
        s2_new = a * (s2_u + (m_u - m_new) * s1_u) + a_t * (s2_t + (m_t - m_new) * s1_t)
        return (tuple(new_ms), tuple(new_s1s), tuple(new_picks),
                m_new, s1_new, s2_new), None

    n_t = Vp // tV
    offs = jnp.arange(n_t, dtype=jnp.int32) * tV
    zeros = jnp.zeros((N,), jnp.float32)
    init = (
        tuple(jnp.full((N,), _NEG, jnp.float32) for _ in range(n_streams)),
        tuple(zeros for _ in range(n_streams)),
        tuple(zeros for _ in range(n_streams)),
        jnp.full((N,), _NEG, jnp.float32), zeros, zeros,
    )
    xs = (offs, tuple(w_tiles), tuple(b_tiles))  # w_tiles[d]: [n_t, H, tV]

    (ms, s1s, picks, m_u, s1_u, s2_u), _ = jax.lax.scan(body, init, xs)

    lses = tuple(ms[d] + jnp.log(s1s[d]) for d in range(n_streams))
    ce_row = sum(picks[d] - lses[d] for d in range(n_streams))
    lse_u = m_u + jnp.log(s1_u)
    b_row = s2_u / s1_u - jnp.log(s1_u)
    res = (h_list, outs, gold, lses, lse_u, b_row)
    return (ce_row, b_row), res


def _fused_rows_bwd(cdtype_name, tile_v, n_streams, res, cts):
    cdtype = jnp.dtype(cdtype_name)
    h_list, outs, gold, lses, lse_u, b_row = res
    c1, c2 = cts  # dL/d ce_row [N], dL/d b_row [N]
    w_tiles, b_tiles, V, Vp, tV = _tile_weights(outs, tile_v)
    N = gold.shape[0]
    h2 = [h.astype(cdtype) for h in h_list]

    def body(carry, xs):
        off, w_ts, b_ts = xs
        gh = carry
        col = off + jax.lax.iota(jnp.int32, tV)
        valid = col < V
        loc = jnp.clip(gold - off, 0, tV - 1)
        in_tile = (gold >= off) & (gold < off + tV)
        onehot = (in_tile[:, None] & (col[None, :] == gold[:, None])).astype(jnp.float32)
        ls = [_tile_logits(h2[d], w_ts[d], b_ts[d], valid, cdtype)
              for d in range(n_streams)]
        u = sum(ls)
        p_u = jnp.exp(u - lse_u[:, None])                      # 0 on padding cols
        ent_part = c2[:, None] * p_u * (u - lse_u[:, None] - b_row[:, None])
        ent_part = jnp.where(valid[None, :], ent_part, 0.0)
        new_gh, gws, gbs = [], [], []
        for d in range(n_streams):
            p_d = jnp.exp(ls[d] - lses[d][:, None])
            dl = c1[:, None] * (onehot - p_d) + ent_part       # [N, tV] f32
            dl_c = dl.astype(cdtype)
            gws.append((h2[d].T @ dl_c))                       # [H_d, tV]
            gbs.append(jnp.sum(dl, axis=0))                    # [tV] f32
            new_gh.append(gh[d] + (dl_c @ w_ts[d].astype(cdtype).T).astype(jnp.float32))
        return tuple(new_gh), (tuple(gws), tuple(gbs))

    n_t = Vp // tV
    offs = jnp.arange(n_t, dtype=jnp.int32) * tV
    init = tuple(jnp.zeros((h.shape[0], h.shape[1]), jnp.float32) for h in h_list)
    gh, (gw_stacked, gb_stacked) = jax.lax.scan(
        body, init, (offs, tuple(w_tiles), tuple(b_tiles)))

    grad_h = tuple(gh[d].astype(h_list[d].dtype) for d in range(n_streams))
    grad_outs = []
    for d in range(n_streams):
        w, b = outs[d]["w"], outs[d]["b"]
        gw = gw_stacked[d].transpose(1, 0, 2).reshape(w.shape[0], Vp)[:, :V]
        gb = gb_stacked[d].reshape(Vp)[:V]
        grad_outs.append({"w": gw.astype(w.dtype), "b": gb.astype(b.dtype)})
    import numpy as np

    gold_ct = np.zeros(gold.shape, dtype=jax.dtypes.float0)  # int input: float0
    return grad_h, tuple(grad_outs), gold_ct


_fused_rows.defvjp(_fused_rows_fwd, _fused_rows_bwd)


def ce_entropy_from_hiddens(
    hiddens: Sequence[jnp.ndarray],          # per stream [L, B, H_d], row 0 zeroed
    outs: Sequence[dict],                    # per stream {"w": [H_d, V], "b": [V]}
    captions: jnp.ndarray,                   # [L, B] int gold tokens
    sample_mask: Optional[jnp.ndarray] = None,   # [B] bool, True = real row
    compute_dtype=jnp.bfloat16,
    tile_v: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ce, entropy) equal to losses.nll_loss / losses.entropy_loss on the
    materialized outputs (vocab-axis entropy), without building them.

    ``hiddens`` carries the decoder contract's zeroed row 0 ([L, B, H]);
    positions [1:] enter the loss, like outputs[1:] in the reference."""
    n_streams = len(hiddens)
    L, B = captions.shape
    gold = captions[1:].reshape(-1)                                  # [N]
    h_list = tuple(h[1:].reshape((L - 1) * B, h.shape[2]) for h in hiddens)
    ce_row, b_row = _fused_rows(
        h_list, tuple(outs), gold,
        jnp.dtype(compute_dtype).name, int(tile_v), n_streams,
    )
    pad = (gold != PAD_ID).astype(jnp.float32)
    ce = -(ce_row * pad).sum() / jnp.maximum(pad.sum(), 1.0)

    b_mat = (b_row * pad).reshape(L - 1, B)
    per_col = b_mat.sum(axis=0)                                      # [B]
    if sample_mask is None:
        ent = -per_col.mean()
    else:
        sm = sample_mask.astype(per_col.dtype)
        ent = -(per_col * sm).sum() / jnp.maximum(sm.sum(), 1.0)
    return ce, ent
