"""Fused whole-sentence greedy decode as ONE Pallas TPU kernel.

Round-1 measured per-step kernels (attention + LSTM cell inside
a lax.scan) at 23.5k captions/s vs 29.6k for XLA at the headline decode shape
(B=64, T=16, L=30, V=4000): per-step pallas_call overhead plus full weight
re-reads per step lose to XLA's streaming fusion (BENCH_NOTES.md).  This is
the round-2 design (ROADMAP #2): the ENTIRE greedy decode
(reference src/models/features_captioning.py:91-129 with tf off) runs in one
pallas_call —

- small state lives in VMEM for all L steps: features, attention keys,
  embedding table, recurrent weights ``wh``, attention params, biases
- the two big matrices stream from HBM in double-buffered, tile-major chunks:
  ``wi`` [K, 4H] as gate-column tiles and ``wout`` [H, V] as vocab tiles —
  each tile's DMA overlaps the previous tile's MXU work, and VMEM never holds
  more than two tiles of either
- greedy feed needs only ``argmax(logits)`` (log-softmax is monotone), so the
  vocab projection keeps a running (max, argmax) across ``wout`` tiles and
  the full [L, B, V] log-prob tensor is never materialized
- gate tiles are processed in torch order (i, f, g, o) with the cell update
  folded in, so only one [B, TG] gate stripe is live at a time
- the step/frame/tile loops are fully unrolled (L, T and the tile counts are
  small static numbers), so every memory access has a static offset —
  Mosaic's alignment rules for dynamic lane/sublane indices never trigger,
  and h/c/prev/gates are plain SSA values

Per-step HBM traffic drops from ~32 MB (f32 wi+wh+wout, XLA) to ~14 MB of
bf16 tiles; everything else is VMEM-resident.  With factored context-gates
(pallas_beam._use_factored: P = feats @ wi_ctx replaces the context rows of
the wi stream, wide features only) the streamed wi shrinks to the embedded
rows — ~6 MB/step at the headline shape.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvc_tpu.ops._gates import apply_gate_tile
from mvc_tpu.ops.pallas_beam import BATCH_TILES, _use_factored


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _embed_prev(prev, emb_ref, wdtype, B):
    """Embedding of the previous token: one-hot matmul on the MXU."""
    Vp = emb_ref.shape[0]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
    onehot = (iota_v == prev).astype(wdtype)                   # [B, Vp]
    return jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)


def _attn_wsum(h, feats_ref, keys2_ref, wrow_ref, mask_ref,
               attn_w_ref, attn_b_ref, A, wdtype):
    """Additive attention over frames; returns the weighted sum over the
    per-clip slab — the context vector (direct) or the context rows' gate
    preactivation (factored, slab = P).  All T frames' energies in ONE
    tanh on the [B, T, A] view, contracted against the energy vector w as
    a lane reduction (an [*, A] x [A, 1] matmul is the worst possible MXU
    shape — N=1)."""
    T, B, F = feats_ref.shape
    q = jnp.dot(h.astype(wdtype), attn_w_ref[:],
                preferred_element_type=jnp.float32)            # [B, A]
    q_b = q + attn_b_ref[:]
    e_all = jnp.tanh(keys2_ref[:].astype(jnp.float32).reshape(B, T, A)
                     + q_b[:, None, :])
    energies = jnp.sum(e_all * wrow_ref[:].reshape(1, 1, A), axis=2)
    mask = mask_ref[:]
    neg = jnp.float32(-1e30)
    energies = jnp.where(mask > 0, energies, neg)
    m = jnp.max(energies, axis=1, keepdims=True)
    m = jnp.where(m > neg / 2, m, 0.0)
    unnorm = jnp.where(mask > 0, jnp.exp(energies - m), 0.0)
    denom = jnp.maximum(jnp.sum(unnorm, axis=1, keepdims=True), 1e-30)
    weights = unnorm / denom                                   # [B, T] f32
    wsum = jnp.zeros((B, F), jnp.float32)
    for tt in range(T):
        wsum = wsum + weights[:, tt:tt + 1] * feats_ref[tt].astype(jnp.float32)
    return wsum


def _decode_kernel(
    # VMEM-resident inputs (feats/keys time-major: per-frame reads index the
    # leading, untiled axis)
    feats_ref,      # [T, B, F] — or [T, B, G*H] (P = feats @ wi_ctx) factored
    keys2_ref,      # [B, T*A]    (precomputed U @ feats, frame-blocks on lanes)
    wrow_ref,       # [1, A]      f32 energy vector w
    mask_ref,       # [B, T]      f32 (1.0 attendable / 0.0 masked)
    emb_ref,        # [Vp, E]     (padded vocab rows are zeros)
    attn_w_ref,     # [H, A]      (query projection W)
    attn_b_ref,     # [1, A]      f32
    wh_ref,         # [H, G*H]    (G = 4 LSTM / 3 GRU)
    b_gates_ref,    # [1, G*H]    f32 (bi + bh for LSTM; bi alone for GRU)
    b_h_ref,        # [1, G*H]    f32 (bh for GRU — its n-gate keeps the
                    #              recurrent bias inside the reset product;
                    #              zeros/unused for LSTM)
    b_out_ref,      # [1, Vp]     f32 (padded cols = -inf so argmax skips them)
    # HBM-resident streamed inputs (tile-major)
    wi_hbm,         # [n_g, Kp, TG]
    wout_hbm,       # [n_v, H, TV]
    # output
    tokens_ref,     # [B, L] int32
    # scratch
    wi_buf,         # [2, Kp, TG]
    wout_buf,       # [2, H, TV]
    wi_sem,         # DMA (2,)
    wout_sem,       # DMA (2,)
    *,
    L: int,
    sos_id: int,
    cell: str,      # "LSTM" | "GRU"
    factored: bool,
    A: int,
):
    T, B, F = feats_ref.shape
    H = wh_ref.shape[0]
    Vp = emb_ref.shape[0]
    E = emb_ref.shape[1]
    Kp = wi_buf.shape[1]
    n_g, _, TG = wi_hbm.shape
    n_v, _, TV = wout_hbm.shape
    wdtype = wi_buf.dtype
    pad = Kp - E if factored else Kp - (F + E)

    def wi_dma(slot, j):
        return pltpu.make_async_copy(wi_hbm.at[j], wi_buf.at[slot], wi_sem.at[slot])

    def wout_dma(slot, j):
        return pltpu.make_async_copy(wout_hbm.at[j], wout_buf.at[slot], wout_sem.at[slot])

    h = jnp.zeros((B, H), jnp.float32)
    c = jnp.zeros((B, H), jnp.float32)
    prev = jnp.full((B, 1), sos_id, jnp.int32)

    wi_dma(0, 0).start()  # warm up the stream

    for t in range(L):
        # ---- 1. embedding of prev token
        embedded = _embed_prev(prev, emb_ref, wdtype, B)

        # ---- 2. additive attention over frames
        wsum = _attn_wsum(h, feats_ref, keys2_ref, wrow_ref, mask_ref,
                          attn_w_ref, attn_b_ref, A, wdtype)

        # ---- 3. step input x = [context | embedded | 0-pad] (direct) or
        # [embedded | 0-pad] (factored: context reaches the gates via ctxg)
        ctxg = wsum if factored else None
        parts = ([] if factored else [wsum.astype(wdtype)]) + [embedded.astype(wdtype)]
        if pad:
            parts.append(jnp.zeros((B, pad), wdtype))
        x = jnp.concatenate(parts, axis=1)                     # [B, Kp]
        h_prev = h.astype(wdtype)
        h_f32 = h

        # ---- 4. gates from double-buffered wi tiles (torch gate order:
        # LSTM i,f,g,o with the cell update folded in; GRU r,z,n with the
        # recurrent n-bias kept inside the reset product)
        tiles_per_gate = H // TG
        i_parts, g_parts = [None] * tiles_per_gate, [None] * tiles_per_gate
        c_parts = [c[:, k * TG:(k + 1) * TG] for k in range(tiles_per_gate)]
        h_parts = [None] * tiles_per_gate
        for j in range(n_g):
            slot, nxt = j % 2, (j + 1) % 2
            if j + 1 < n_g:
                wi_dma(nxt, j + 1).start()
            else:
                wout_dma(0, 0).start()
            wi_dma(slot, j).wait()
            col = j * TG
            gate_id, k = col // H, (col % H) // TG
            gh = (jnp.dot(h_prev, wh_ref[:, col:col + TG],
                          preferred_element_type=jnp.float32)
                  + (b_h_ref[:, col:col + TG] if cell == "GRU" else 0.0))
            gv = (jnp.dot(x, wi_buf[slot], preferred_element_type=jnp.float32)
                  + b_gates_ref[:, col:col + TG])
            if factored:
                gv = gv + ctxg[:, col:col + TG]
            if cell == "LSTM":
                gv = gv + gh                                   # fused preact
            apply_gate_tile(cell, gate_id, k, gv, gh, i_parts, g_parts,
                            c_parts, h_parts, h_f32, TG)
        if cell == "LSTM":
            c = jnp.concatenate(c_parts, axis=1)
        h = jnp.concatenate(h_parts, axis=1)

        # ---- 5. vocab projection from double-buffered wout tiles + running argmax
        best_val = jnp.full((B, 1), -jnp.inf, jnp.float32)
        best_idx = jnp.zeros((B, 1), jnp.int32)
        h_new = h.astype(wdtype)
        for j in range(n_v):
            slot, nxt = j % 2, (j + 1) % 2
            if j + 1 < n_v:
                wout_dma(nxt, j + 1).start()
            elif t + 1 < L:
                wi_dma(0, 0).start()       # next step's first gate tile
            wout_dma(slot, j).wait()
            logits = (
                jnp.dot(h_new, wout_buf[slot], preferred_element_type=jnp.float32)
                + b_out_ref[:, j * TV:(j + 1) * TV]
            )                                                  # [B, TV]
            loc_max = jnp.max(logits, axis=1, keepdims=True)
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (B, TV), 1)
            # torch/XLA argmax tie-breaks to the LOWEST index
            loc_arg = jnp.min(
                jnp.where(logits == loc_max, iota_t + j * TV, jnp.int32(2**30)),
                axis=1, keepdims=True,
            )
            better = loc_max > best_val
            best_idx = jnp.where(better, loc_arg, best_idx)
            best_val = jnp.where(better, loc_max, best_val)

        prev = best_idx
        tokens_ref[:, t:t + 1] = best_idx                      # column t


def _decode_kernel_resident(
    feats_ref,      # [T, B, F] — or [T, B, G*H] (P = feats @ wi_ctx) factored
    keys2_ref,      # [B, T*A]
    wrow_ref,       # [1, A]
    mask_ref,       # [B, T]
    emb_ref,        # [Vp, E]
    attn_w_ref,     # [H, A]
    attn_b_ref,     # [1, A]
    wh_ref,         # [H, G*H]
    b_gates_ref,    # [1, G*H]
    b_h_ref,        # [1, G*H]
    b_out_ref,      # [1, Vp]
    wi_ref,         # [Kp, G*H]  VMEM-RESIDENT (vs the streaming kernel's HBM tiles)
    wout_ref,       # [H, Vp]    VMEM-RESIDENT
    tokens_ref,     # [B, L] int32
    *,
    L: int,
    sos_id: int,
    cell: str,
    factored: bool,
    A: int,
):
    """Resident-weight variant of ``_decode_kernel``: at reference shapes the
    ENTIRE weight set (wi, wout, embeddings, wh — ~8 MB bf16 at the headline
    B=64/V=4000 shape) fits v5e VMEM with room to spare, so instead of
    re-streaming wi/wout tiles from HBM every step (L x ~6 MB of DMA + 2 x
    n_tiles semaphore waits per step on the critical path), weights are read
    from HBM ONCE by the pallas_call prologue and every step is two
    full-width matmuls.  Token-identical to the streaming kernel (same
    reduction axis per output column; same lowest-index argmax tie-break)."""
    T, B, F = feats_ref.shape
    H = wh_ref.shape[0]
    Vp = emb_ref.shape[0]
    E = emb_ref.shape[1]
    Kp, H4 = wi_ref.shape
    n_gates = 4 if cell == "LSTM" else 3
    wdtype = wi_ref.dtype
    pad = Kp - E if factored else Kp - (F + E)

    h = jnp.zeros((B, H), jnp.float32)
    c = jnp.zeros((B, H), jnp.float32)
    prev = jnp.full((B, 1), sos_id, jnp.int32)

    for t in range(L):
        embedded = _embed_prev(prev, emb_ref, wdtype, B)
        wsum = _attn_wsum(h, feats_ref, keys2_ref, wrow_ref, mask_ref,
                          attn_w_ref, attn_b_ref, A, wdtype)

        ctxg = wsum if factored else None
        parts = ([] if factored else [wsum.astype(wdtype)]) + [embedded.astype(wdtype)]
        if pad:
            parts.append(jnp.zeros((B, pad), wdtype))
        x = jnp.concatenate(parts, axis=1)                     # [B, Kp]
        h_prev = h.astype(wdtype)
        h_f32 = h

        # ---- gates: ONE full-width input matmul (+ the recurrent one), then
        # the shared per-gate elementwise update on whole-gate slices
        gv_full = (jnp.dot(x, wi_ref[:], preferred_element_type=jnp.float32)
                   + b_gates_ref[:])
        if factored:
            gv_full = gv_full + ctxg
        gh_full = jnp.dot(h_prev, wh_ref[:], preferred_element_type=jnp.float32)
        if cell == "GRU":
            gh_full = gh_full + b_h_ref[:]
        i_parts, g_parts = [None], [None]
        c_parts, h_parts = [c], [None]
        for gate_id in range(n_gates):
            col = gate_id * H
            gv = gv_full[:, col:col + H]
            gh = gh_full[:, col:col + H]
            if cell == "LSTM":
                gv = gv + gh                                   # fused preact
            apply_gate_tile(cell, gate_id, 0, gv, gh, i_parts, g_parts,
                            c_parts, h_parts, h_f32, H)
        if cell == "LSTM":
            c = c_parts[0]
        h = h_parts[0]

        # ---- vocab projection + argmax in one pass (padded cols carry -inf
        # bias; torch/XLA argmax tie-breaks to the LOWEST index)
        logits = (jnp.dot(h.astype(wdtype), wout_ref[:],
                          preferred_element_type=jnp.float32)
                  + b_out_ref[:])                              # [B, Vp]
        m = jnp.max(logits, axis=1, keepdims=True)
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
        best_idx = jnp.min(
            jnp.where(logits == m, iota_v, jnp.int32(2**30)),
            axis=1, keepdims=True,
        )
        prev = best_idx
        tokens_ref[:, t:t + 1] = best_idx                      # column t


def _resident_fits(B, T, Fslab, A, E, H, H4, Vp, Kp, itemsize) -> bool:
    """Auto rule for the resident-weight kernel: VMEM-resident operands +
    dominant live f32 activations, with the same 25% margin fits_vmem uses,
    against the v5e ~128 MiB capacity.  Also requires B >= 48: measured on
    one v5e (scripts/bench_resident.py, BENCH_NOTES round 4b), resident wins
    1.17x at B=64 and 1.10x at B=96 but LOSES (0.89x) at B=32, where the
    full-width matmuls are too row-starved to beat the streaming overlap."""
    if B < 48:
        return False
    total = (T * B * Fslab + B * T * A + Vp * E + H * H4
             + Kp * H4 + H * Vp) * itemsize
    total += 2 * B * Vp * 4        # one-hot + logits f32
    total += 2 * B * H4 * 4        # gv_full / gh_full f32
    return total * 4 // 3 < 128 * 1024 * 1024


def _tiled_resident_fits(Bt, T, Fslab, A, E, H, H4, Vp, Kp, itemsize) -> bool:
    """Fit rule for one BATCH TILE of the grid-tiled resident kernel: the
    batch-blocked operands (per-clip slab, keys, mask, tokens) are
    double-buffered by the Pallas pipeline (next tile prefetches while the
    current one computes), so they count twice; the constant-index weight
    blocks are single-buffered (the pipeline skips re-copies when the block
    index does not change between grid steps)."""
    if Bt < 48:
        return False
    total = (Vp * E + H * H4 + Kp * H4 + H * Vp) * itemsize  # weights, once
    total += 2 * (T * Bt * Fslab + Bt * T * A) * itemsize    # slab+keys, 2x
    total += 2 * Bt * T * 4                                  # mask f32, 2x
    total += 2 * Bt * Vp * 4                                 # one-hot + logits f32
    total += 2 * Bt * H4 * 4                                 # gv_full / gh_full f32
    return total * 4 // 3 < 128 * 1024 * 1024


def _pick_batch_tile(B, fits) -> Optional[int]:
    """Largest BATCH_TILES divisor of B (strictly smaller than B) whose
    grid tile passes ``fits`` — None when batch tiling doesn't apply."""
    for bt in BATCH_TILES:
        if bt < B and B % bt == 0 and fits(bt):
            return bt
    return None


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_caption_len", "sos_id", "tile_g", "tile_v", "weight_dtype",
        "interpret", "rnn_type", "resident", "batch_tile",
    ),
)
def greedy_decode_pallas(
    params,
    feats: jnp.ndarray,                      # [B, T, F] (any float dtype)
    feat_mask: Optional[jnp.ndarray] = None,  # [B, T] bool
    max_caption_len: int = 30,
    sos_id: int = 1,
    tile_g: int = 256,
    tile_v: int = 512,
    weight_dtype: str = "bfloat16",
    interpret: bool = False,
    rnn_type: str = "LSTM",
    resident: Optional[bool] = None,
    batch_tile: Optional[int] = None,
) -> jnp.ndarray:
    """Whole-decode fused greedy predict -> tokens [B, L], matching
    ``greedy_tokens(decode(..., captions=None, max_caption_len=L)[0])``:
    column 0 is the argmax of the zero row (= 0) and columns 1..L-1 are the
    L-1 decode steps.

    ``params`` is an init_decoder tree.  Weights stream as ``weight_dtype``
    tiles (bf16 for the perf path; f32 for exact-parity tests); activations
    accumulate in f32.  ``resident=None`` auto-selects the resident-weight
    kernel (wi/wout VMEM-resident for all steps, no per-step weight DMA)
    whenever everything fits the VMEM budget — token-identical to the
    streaming kernel.
    """
    B, T, F = feats.shape
    wdtype = jnp.dtype(weight_dtype)

    emb = params["embedding"]["table"]
    V, E = emb.shape
    wi = params["rnn"]["wi"]
    wh = params["rnn"]["wh"]
    K1, H4 = wi.shape
    n_gates = 4 if rnn_type == "LSTM" else 3
    H = H4 // n_gates
    wout = params["out"]["w"]
    b_out = params["out"]["b"].astype(jnp.float32)
    ap = params["attention"]
    A = ap["W"].shape[1]

    # L-1 in-kernel steps; the leading zero column is prepended below.
    L = int(max_caption_len) - 1
    assert L >= 1, "max_caption_len must be >= 2"
    if H % tile_g or tile_g > H:
        tile_g = H
    tile_v = min(tile_v, _round_up(V, 128))
    Vp = _round_up(V, tile_v)
    factored = _use_factored(B * T, F, H4)
    Kp = _round_up(E, 256) if factored else _round_up(K1, 256)
    if batch_tile is not None:
        # explicit knob: grid-tiled resident kernel at this tile size
        assert B % batch_tile == 0 and batch_tile < B, (
            f"batch_tile={batch_tile} must divide and be smaller than B={B}")
        resident = True
    elif resident is None:
        resident = _resident_fits(B, T, H4 if factored else F, A, E, H, H4,
                                  Vp, Kp, wdtype.itemsize)
        if not resident:
            # Bulk batches blow the whole-batch VMEM fit exactly where weight
            # reuse is best — grid-tile the batch over the RESIDENT kernel
            # instead: weights load once (constant-index blocks), per-clip
            # slabs stream tile by tile (VERDICT r4 item 2).
            batch_tile = _pick_batch_tile(
                B, lambda bt: _tiled_resident_fits(
                    bt, T, H4 if factored else F, A, E, H, H4, Vp, Kp,
                    wdtype.itemsize))
            resident = batch_tile is not None

    feats_h = feats.astype(wdtype)
    keys = (feats_h @ ap["U"].astype(wdtype)).astype(wdtype)
    if factored:
        # Context rows' gate preactivation is linear in feats: precompute
        # P = feats @ wi_ctx once and drop wi's context rows from the stream.
        slab_tm = (
            jnp.dot(feats_h.reshape(B * T, F), wi[E:].astype(wdtype),
                    preferred_element_type=jnp.float32)
            .astype(wdtype).reshape(B, T, H4).transpose(1, 0, 2)
        )                                       # [T, B, H4] time-major
    else:
        slab_tm = feats_h.transpose(1, 0, 2)    # [T, B, F] time-major
    keys2 = keys.reshape(B, T * A)             # [B, T*A] frame-major lane blocks
    w_row = ap["w"].astype(jnp.float32).reshape(1, A)
    mask = (
        feat_mask.astype(jnp.float32)
        if feat_mask is not None else jnp.ones((B, T), jnp.float32)
    )

    emb_p = jnp.zeros((Vp, E), wdtype).at[:V].set(emb.astype(wdtype))

    # x layout is [context(F) | embedded(E) | 0-pad]; reorder wi rows to match
    # (decoder x = concat([embedded, context]) -> rows [E:], then rows [:E]).
    # Factored: only the embedded rows stream; context rows live in P.
    wi_x = (wi[:E] if factored
            else jnp.concatenate([wi[E:], wi[:E]], axis=0)).astype(wdtype)
    wi_p = jnp.zeros((Kp, H4), wdtype).at[:wi_x.shape[0]].set(wi_x)
    wout_p = jnp.zeros((H, Vp), wdtype).at[:, :V].set(wout.astype(wdtype))
    b_out_p = jnp.full((1, Vp), -1e30, jnp.float32).at[0, :V].set(b_out)

    if rnn_type == "LSTM":
        b_gates = (params["rnn"]["bi"] + params["rnn"]["bh"]).astype(jnp.float32).reshape(1, H4)
        b_h = jnp.zeros((1, H4), jnp.float32)
    else:
        b_gates = params["rnn"]["bi"].astype(jnp.float32).reshape(1, H4)
        b_h = params["rnn"]["bh"].astype(jnp.float32).reshape(1, H4)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec(memory_space=pl.ANY)
    common_operands = (
        slab_tm, keys2, w_row, mask, emb_p,
        ap["W"].astype(wdtype),
        ap["b"].astype(jnp.float32).reshape(1, A),
        wh.astype(wdtype), b_gates, b_h, b_out_p,
    )
    flops = 2 * L * B * (Kp * H4 + H * H4 + H * Vp + Vp * E + T * A)
    transc = L * B * (4 * H + T * A)

    if resident and batch_tile is not None:
        # Grid-tiled resident kernel: one grid step per batch tile, weights
        # as constant-index VMEM blocks (fetched once, kept across steps),
        # per-clip operands blocked along the batch axis.
        Bt = batch_tile
        kernel = functools.partial(_decode_kernel_resident, L=L, sos_id=sos_id,
                                   cell=rnn_type, factored=factored, A=A)

        def const(x):
            return pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim)

        tokens = pl.pallas_call(
            kernel,
            grid=(B // Bt,),
            in_specs=[
                pl.BlockSpec((T, Bt, slab_tm.shape[2]), lambda i: (0, i, 0)),
                pl.BlockSpec((Bt, T * A), lambda i: (i, 0)),
                const(w_row),
                pl.BlockSpec((Bt, T), lambda i: (i, 0)),
                const(emb_p),
                const(common_operands[5]),    # attn W
                const(common_operands[6]),    # attn b
                const(common_operands[7]),    # wh
                const(b_gates), const(b_h), const(b_out_p),
                const(wi_p), const(wout_p),
            ],
            out_specs=pl.BlockSpec((Bt, L), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                # weights once; per-clip slabs once across the grid
                bytes_accessed=(Kp * H4 + H * Vp + Vp * E + H * H4
                                + T * B * slab_tm.shape[2]) * wdtype.itemsize,
                transcendentals=transc,
            ),
        )(*common_operands, wi_p, wout_p)
    elif resident:
        kernel = functools.partial(_decode_kernel_resident, L=L, sos_id=sos_id,
                                   cell=rnn_type, factored=factored, A=A)
        tokens = pl.pallas_call(
            kernel,
            in_specs=[vspec] * 13,
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                # every operand read from HBM exactly once
                bytes_accessed=(Kp * H4 + H * Vp + Vp * E + H * H4
                                + T * B * slab_tm.shape[2]) * wdtype.itemsize,
                transcendentals=transc,
            ),
        )(*common_operands, wi_p, wout_p)
    else:
        n_g = H4 // tile_g
        wi_tiles = wi_p.reshape(Kp, n_g, tile_g).transpose(1, 0, 2)    # [n_g, Kp, TG]
        n_v = Vp // tile_v
        wout_tiles = wout_p.reshape(H, n_v, tile_v).transpose(1, 0, 2)  # [n_v, H, TV]
        kernel = functools.partial(_decode_kernel, L=L, sos_id=sos_id,
                                   cell=rnn_type, factored=factored, A=A)
        tokens = pl.pallas_call(
            kernel,
            in_specs=[
                vspec,  # feats
                vspec,  # keys2
                vspec,  # w_row
                vspec,  # mask
                vspec,  # emb
                vspec,  # attn W
                vspec,  # attn b
                vspec,  # wh
                vspec,  # b_gates
                vspec,  # b_h
                vspec,  # b_out
                hspec,  # wi tiles (HBM)
                hspec,  # wout tiles (HBM)
            ],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((2, Kp, tile_g), wdtype),
                pltpu.VMEM((2, H, tile_v), wdtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=L * (Kp * tile_g * n_g + H * Vp) * wdtype.itemsize,
                transcendentals=transc,
            ),
        )(*common_operands, wi_tiles, wout_tiles)
    return jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), tokens], axis=1
    )                                                          # [B, max_caption_len]
