"""Fused whole-sentence BEAM-SEARCH decode as ONE Pallas TPU kernel.

The XLA beam path (models/beam.py + decoder_beam_step) is a lax.scan whose
per-step dependency chain — embed, attend, LSTM, vocab projection, top-k,
regather — leaves the chip latency-bound at the headline shape (B=64, W=5,
T=16, L=30, V=4000: ~5.6 ms/call while the weight traffic alone is ~1 ms of
HBM time).  Like ops/pallas_decode.py for greedy, this kernel runs the
ENTIRE beam search in one pallas_call:

- rows are beam-flattened ``[B*W, ...]``; per-clip tensors (features, keys,
  frame mask) are stored once per clip and broadcast to beam rows with
  one-hot matmuls built from iota comparisons (no gathers)
- small state (features, attention keys, h/c for every decoder, cumulative
  scores, finished flags, token history, and the concatenated embedding
  tables — the joint beam feeds ONE token to both decoders) stays in VMEM
  for all L steps
- the big matrices stream from HBM double-buffered: per decoder the gate
  weights (LSTM: fused input+recurrent ``[wi; wh]``; GRU: ``wi`` only, with
  ``wh`` VMEM-resident since torch's n-gate keeps its recurrent bias inside
  the reset product) and the vocab projections ``wout``
- beam scoring is computed tile-by-tile over the vocabulary: a streaming
  per-decoder logsumexp (for log-softmax) plus a streaming per-row top-W of
  the FUSED logits — the ``[B, W, V]`` log-prob tensor is never materialized.
  Within a row, ranking by fused logits equals ranking by
  ``cum + Σ_d log_softmax_d`` (the row's lse/cum shift is constant), so the
  candidate set is exact
- the cross-beam top-W (reference GNMT length normalization, EOS masking,
  tie-break by flattened ``w*V + token`` index — models/beam.py semantics,
  themselves replicating reference src/models/features_captioning.py:131-228)
  runs on W*W=25 candidates per clip, moved between row- and clip-space with
  iota-built selection matmuls
- beam regather of h/c/history is a one-hot permutation matmul on the MXU
- the step loop is a ``lax.while_loop`` with an all-finished EARLY EXIT:
  once a step begins with every beam finished, that step only sorts beams
  by normalized score and every later step would write token 0 (the
  history's fill value) under an identity permutation — stopping there is
  output-identical to the full-L scan, and 2-3x faster on real data where
  captions EOS well before max length

Token-id parity with the XLA beam path is asserted in tests/test_pallas.py
(f32 weights, interpret mode) for single and dual decoders, LSTM and GRU
(mixed allowed), masked and unmasked, alpha 0 and alpha>0, and EOS-heavy
early-exit weights.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvc_tpu.config import EOS_ID, SOS_ID
from mvc_tpu.ops._gates import apply_gate_tile

NEG_INF = -1e9      # matches models/beam.py NEG_INF (dead-beam init score)
BOTTOM = -3.0e38    # streaming-max sentinel (finite: keeps arithmetic NaN-free)
BIG_IDX = 1.0e9     # tie-break sentinel index


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _use_factored(BT: int, F: int, H4: int) -> bool:
    """Factored context-gates: the context vector only ever enters the cell
    through ``context @ wi_ctx``, and context is linear in the features —
    so ``P = feats @ wi_ctx`` ([B*T, H4]) can be precomputed ONCE per call
    and the per-step contribution becomes the same block-masked
    attention-weighted sum already used to build context, just over P
    instead of feats.  Per step that trades ``2*BW*(BT*F + F*H4)`` FLOPs
    (context build + its gate matmul) for ``2*BW*BT*H4`` and removes the
    ``[F, H4]`` slab from the streamed gate tiles (−8.4 MB/step of HBM at
    the headline visual shape).  Worth it exactly when the traded FLOPs
    shrink — true for wide features (visual F=2048), false for narrow ones
    (audio F=128, where streaming wi_ctx is cheaper than a [BT, H4] sum)."""
    return BT * H4 < BT * F + F * H4


BATCH_TILES = (512, 256, 128, 64)   # grid batch-tile candidates, largest first


def fits_vmem(
    decoder_params, feats_list, beam_width: int = 1,
    weight_dtype: str = "bfloat16", vmem_limit_mb: int = 128,
    rnn_types: Optional[Sequence[str]] = None, batch_div: int = 1,
    tile_g: int = 256, tile_v: int = 1024,
    allow_batch_tiling: bool = False,
) -> bool:
    """Host-side pre-flight: do the kernel's VMEM-RESIDENT operands plausibly
    fit the budget?  Accounts for the beam kernel's layout (the heaviest of
    the three fused kernels): the concatenated embedding tables, the
    per-clip slab (features, or P = feats @ wi_ctx when factored) plus
    attention keys, a GRU's VMEM-resident recurrent weights ``wh``, the
    double-buffered streaming tiles, the one-hot embedding intermediate, and
    the dominant live f32 activations — each cell type using its actual
    gate count.

    ``batch_div`` divides the batch for the per-shard check under the
    shard_map composition (ops/sharded.py).  The 25% margin absorbs Mosaic
    padding and scheduling slack, but a passing pre-flight cannot *guarantee*
    a Mosaic compile on exotic shapes — dispatchers treat ``False`` as "take
    the XLA scan", never as a hard error, and a compile failure remains
    possible in principle (none observed at the reference configs).

    The default budget is the v5e VMEM capacity (~128 MiB/core).  A 64 MB
    default shipped in round 3 gated the HEADLINE dual-beam shape (B=64,
    W=5, V=4000: 52.5 MiB estimated residency) off the fused kernel — a
    silent 1.57x regression (12.9k vs 20.2k captions/s measured on one
    v5e); the kernel demonstrably compiles and runs there.  Hardware spot
    checks of the shapes newly admitted by the 128 MB budget live in
    scripts/bench_scale.py; the interpret-mode contract sweep is
    tests/test_pallas.py::test_fits_vmem_contract_sweep."""
    wd = jnp.dtype(weight_dtype).itemsize
    V = decoder_params[0]["embedding"]["table"].shape[0]
    TVr = min(int(tile_v), _round_up(V, 128))
    Vp = _round_up(V, TVr)
    ecat_p = _round_up(
        sum(int(p["embedding"]["table"].shape[1]) for p in decoder_params), 128
    )
    B0, T, _ = feats_list[0].shape
    B0 = -(-B0 // max(1, int(batch_div)))         # per-shard batch

    def est(B: int) -> int:
        BW = B * int(beam_width)
        total = Vp * ecat_p * wd                  # resident emb tables
        total += BW * Vp * 4                      # one-hot f32 intermediate
        for d, (p, f) in enumerate(zip(decoder_params, feats_list)):
            cell = rnn_types[d] if rnn_types is not None else "LSTM"
            _, Tf, F = f.shape
            A = p["attention"]["W"].shape[1]
            E = p["embedding"]["table"].shape[1]
            H4 = p["rnn"]["wi"].shape[1]
            H = H4 // (4 if cell == "LSTM" else 3)
            TG = tile_g if (tile_g <= H and H % tile_g == 0) else H
            factored = _use_factored(B * Tf, F, H4)
            if factored:
                Kp = (_round_up(E + H, 256) if cell == "LSTM"
                      else _round_up(E, 256))
                # P = feats @ wi_ctx replaces feats as the resident per-clip slab
                total += B * Tf * (H4 + A) * wd   # P + keys (stored per clip)
                total += 4 * BW * H4              # live f32 ctx-gate activations
            else:
                Kp = (_round_up(F + E + H, 256) if cell == "LSTM"
                      else _round_up(F + E, 256))
                total += B * Tf * (F + A) * wd    # feats + keys (stored per clip)
            if cell == "GRU":
                total += H * H4 * wd              # resident recurrent weights
            total += 2 * (Kp * TG + H * TVr) * wd  # double-buffered w tiles
            total += 4 * BW * (Kp + H4 + TVr + H)  # live f32 activations
            total += 4 * BW * Tf * A              # f32 energies view [BW, T, A]
            CRc = max(1, min(B, 2048 // max(Tf, 1))) * Tf
            total += 12 * BW * CRc                # wrep/blk/wbd f32 context rows
        return total

    budget = int(vmem_limit_mb * 0.75) << 20
    if est(B0) <= budget:
        return True
    if allow_batch_tiling and beam_width == 1:
        # greedy/dual direct wrappers grid-tile bulk batches over the
        # resident kernel (weights loaded once; per-clip slabs blocked) —
        # admit any shape whose tile fits (the wrapper picks the layout)
        return any(bt < B0 and B0 % bt == 0 and est(bt) <= budget
                   for bt in BATCH_TILES)
    return False


def _beam_kernel(
    *refs,
    dims,            # per-decoder (F, H, A, E, Eoff, Kp, TG, n_g, TV, n_v, cell,
                     #              factored)
    B, T, W, V, L,
    alpha,
    CR,
    sos_id, eos_id,
    topw="streaming",
    resident=False,
):
    n_dec = len(dims)
    BW = B * W
    f32 = jnp.float32

    # ---- ref parsing (order fixed by the wrapper) ----
    nin = 9 + 9 * n_dec
    (mask_ref, row_clip_ref, row_beam_ref, col_clip_ref, col_beam_ref,
     stk_clip_ref, stk_beam_ref, featcol_clip_ref, emb_ref) = refs[:9]
    dec_refs = [refs[9 + 9 * d: 9 + 9 * (d + 1)] for d in range(n_dec)]
    # resident: the same two weight slots hold full-width VMEM inputs
    # ([Kp, H4] / [H, Vp]) instead of HBM tile stacks, and no scratch exists.
    wih_hbm = [refs[nin + 2 * d] for d in range(n_dec)]
    wout_hbm = [refs[nin + 1 + 2 * d] for d in range(n_dec)]
    hist_ref = refs[nin + 2 * n_dec]
    scr = refs[nin + 1 + 2 * n_dec:]
    if resident:
        wih_buf = wout_buf = wih_sem = wout_sem = fused_scr = None
    else:
        wih_buf = [scr[4 * d] for d in range(n_dec)]
        wout_buf = [scr[1 + 4 * d] for d in range(n_dec)]
        wih_sem = [scr[2 + 4 * d] for d in range(n_dec)]
        wout_sem = [scr[3 + 4 * d] for d in range(n_dec)]
        fused_scr = scr[4 * n_dec] if topw == "stored" else None
    wdtype = emb_ref.dtype

    def wih_dma(d, slot, j):
        return pltpu.make_async_copy(wih_hbm[d].at[j], wih_buf[d].at[slot], wih_sem[d].at[slot])

    def wout_dma(d, slot, j):
        return pltpu.make_async_copy(wout_hbm[d].at[j], wout_buf[d].at[slot], wout_sem[d].at[slot])

    # ---- step-invariant selection matrices (iota-built, no gathers) ----
    row_clip = row_clip_ref[:]            # [BW, 1] f32: r // W
    row_beam = row_beam_ref[:]            # [BW, 1] f32: r %  W
    col_clip = col_clip_ref[:]            # [1, BW]
    col_beam = col_beam_ref[:]            # [1, BW]

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (BW, B), 1).astype(f32)
    prep_f = (row_clip == iota_b).astype(f32)          # [BW, B] row r <- clip r//W
    prep_w = prep_f.astype(wdtype)
    mask_rows = jnp.dot(prep_f, mask_ref[:], preferred_element_type=f32)  # [BW, T]

    # pick_all[k*B + b, r] selects row (b, k): ONE [W*B, BW] matmul gathers
    # all beams' candidates to clip-space (was W separate [B, BW] matmuls).
    # stk_* are host-built index columns (no in-kernel int div/mod).
    pick_all = ((col_clip == stk_clip_ref[:])
                * (col_beam == stk_beam_ref[:])).astype(f32)     # [W*B, BW]

    n_cc = (B * T) // CR
    kk = CR // T

    def step(carry):
        t, _, prev, hs, cs, cum, fin, eoslen, hist = carry
        hs, cs = list(hs), list(cs)
        # Early-exit bookkeeping: a step that BEGINS with every beam finished
        # only sorts beams by normalized score; every later step would write
        # token 0 (already hist's fill value) under an identity permutation,
        # so after this step the loop can stop — output-identical to running
        # all L steps (models/beam.py semantics).
        began_allfin = jnp.min(fin) > 0.0

        # ---- 1. embedding of prev token: one-hot matmul against the
        # VMEM-resident concatenated tables (Vp x Ecat_p fits on-chip;
        # streaming it cost ~6 MB of HBM per step plus a step-start bubble)
        Vp = emb_ref.shape[0]
        iot = jax.lax.broadcasted_iota(jnp.int32, (BW, Vp), 1).astype(f32)
        onehot = (iot == prev).astype(wdtype)
        acc = jnp.dot(onehot, emb_ref[:], preferred_element_type=f32)

        # ---- 2. per-decoder attention + step input x.  A factored decoder's
        # feats_ref slot holds P = feats @ wi_ctx ([B*T, H4]): the same
        # block-masked weighted sum that built context now yields the context
        # rows' gate PREACTIVATION directly (ctxg), and context drops out of
        # the streamed x entirely.
        xs = []
        ctxgs = []
        for d in range(n_dec):
            F, H, A, E, Eoff, Kp, TG, n_g, TV, n_v, cell, factored = dims[d]
            feats_ref, keys_ref, wrow_ref, attn_w_ref, attn_b_ref = dec_refs[d][:5]
            h = hs[d]

            q = jnp.dot(h.astype(wdtype), attn_w_ref[:],
                        preferred_element_type=f32) + attn_b_ref[:]      # [BW, A]
            # All T frames at once: broadcast the clip keys to beam rows with
            # one matmul, tanh on the [BW, T, A] view, contract the energy
            # vector w as a lane reduction (an [*, A] x [A, 1] matmul is the
            # worst possible MXU shape — N=1).
            krows = jnp.dot(prep_w, keys_ref[:], preferred_element_type=f32)
            e_all = jnp.tanh(krows.reshape(BW, T, A) + q[:, None, :])
            energies = jnp.sum(e_all * wrow_ref[:].reshape(1, 1, A), axis=2)

            neg = jnp.float32(-1e30)
            energies = jnp.where(mask_rows > 0, energies, neg)
            m = jnp.max(energies, axis=1, keepdims=True)
            m = jnp.where(m > neg / 2, m, 0.0)
            unnorm = jnp.where(mask_rows > 0, jnp.exp(energies - m), 0.0)
            denom = jnp.maximum(jnp.sum(unnorm, axis=1, keepdims=True), 1e-30)
            weights = unnorm / denom                                     # [BW, T] f32

            wrep = jnp.concatenate([weights] * kk, axis=1)               # [BW, CR]
            ncol = feats_ref.shape[1]            # F (direct) or H4 (factored)
            wsum = jnp.zeros((BW, ncol), f32)
            for c in range(n_cc):
                blk = (featcol_clip_ref[:, c * CR:(c + 1) * CR] == row_clip).astype(f32)
                wbd = (wrep * blk).astype(wdtype)                        # [BW, CR]
                wsum = wsum + jnp.dot(
                    wbd, feats_ref[c * CR:(c + 1) * CR, :], preferred_element_type=f32
                )

            embedded = acc[:, Eoff:Eoff + E]
            if factored:
                ctxgs.append(wsum)               # [BW, H4] context gate preact
                parts = [embedded.astype(wdtype)]
                if cell == "LSTM":
                    parts.append(h.astype(wdtype))
                    pad = Kp - (E + H)
                else:
                    pad = Kp - E
            else:
                ctxgs.append(None)
                parts = [wsum.astype(wdtype), embedded.astype(wdtype)]
                if cell == "LSTM":
                    parts.append(h.astype(wdtype))   # fused [wi; wh] rows
                    pad = Kp - (F + E + H)
                else:
                    pad = Kp - (F + E)           # GRU: wh stays VMEM-resident
            if pad:
                parts.append(jnp.zeros((BW, pad), wdtype))
            xs.append(jnp.concatenate(parts, axis=1))                    # [BW, Kp]

        # ---- 3. gates from the streamed tiles (LSTM: fused [wi; wh],
        # torch order i,f,g,o; GRU: wi-only tiles r,z,n with wh VMEM-resident
        # and the recurrent n-bias kept inside the reset product).
        # RESIDENT: one full-width matmul per decoder against the VMEM copy —
        # no DMA waits on the chain; same fused-[wi;wh] row layout (x already
        # carries h for LSTM), so gv IS the full preactivation there. ----
        for d in range(n_dec):
            F, H, A, E, Eoff, Kp, TG, n_g, TV, n_v, cell, factored = dims[d]
            b_gates_ref, wh_ref, b_h_ref = (
                dec_refs[d][5], dec_refs[d][7], dec_refs[d][8])
            x, c_state = xs[d], cs[d]
            h_prev = hs[d].astype(wdtype)
            h_f32 = hs[d]
            if resident:
                n_gates = 4 if cell == "LSTM" else 3
                gv_full = (jnp.dot(x, wih_hbm[d][:], preferred_element_type=f32)
                           + b_gates_ref[:])
                if factored:
                    gv_full = gv_full + ctxgs[d]
                gh_full = None
                if cell == "GRU":
                    gh_full = (jnp.dot(h_prev, wh_ref[:],
                                       preferred_element_type=f32) + b_h_ref[:])
                i_parts, g_parts = [None], [None]
                c_parts, h_parts = [c_state], [None]
                for gate_id in range(n_gates):
                    col = gate_id * H
                    gv = gv_full[:, col:col + H]
                    gh = (gh_full[:, col:col + H] if cell == "GRU" else None)
                    apply_gate_tile(cell, gate_id, 0, gv, gh, i_parts, g_parts,
                                    c_parts, h_parts, h_f32, H)
                if cell == "LSTM":
                    cs[d] = c_parts[0]
                hs[d] = h_parts[0]
                continue
            tpg = H // TG
            i_parts, g_parts = [None] * tpg, [None] * tpg
            c_parts = [c_state[:, k * TG:(k + 1) * TG] for k in range(tpg)]
            h_parts = [None] * tpg
            for j in range(n_g):
                slot, nxt = j % 2, (j + 1) % 2
                if j + 1 < n_g:
                    wih_dma(d, nxt, j + 1).start()
                else:
                    wout_dma(d, 0, 0).start()
                wih_dma(d, slot, j).wait()
                col = j * TG
                gate_id, k = col // H, (col % H) // TG
                # LSTM streams fused [wi; wh] (gv is the full preactivation);
                # GRU streams wi only with wh VMEM-resident.
                gv = (jnp.dot(x, wih_buf[d][slot], preferred_element_type=f32)
                      + b_gates_ref[:, col:col + TG])
                if factored:
                    gv = gv + ctxgs[d][:, col:col + TG]
                gh = None
                if cell == "GRU":
                    gh = (jnp.dot(h_prev, wh_ref[:, col:col + TG],
                                  preferred_element_type=f32)
                          + b_h_ref[:, col:col + TG])
                apply_gate_tile(cell, gate_id, k, gv, gh, i_parts, g_parts,
                                c_parts, h_parts, h_f32, TG)
            if cell == "LSTM":
                cs[d] = jnp.concatenate(c_parts, axis=1)
            hs[d] = jnp.concatenate(h_parts, axis=1)

        # ---- 4. fused vocab scoring: streaming lse per decoder + top-W ----
        # Two top-W layouts, output-identical (ties broken by min global
        # token index either way; tests/test_pallas.py):
        #   streaming — per tile, fold the tile's candidates into a running
        #     (vals, tok) top-W: W serial extract-max passes interleaved
        #     BETWEEN the vocab-projection matmuls (the round-3b layout)
        #   stored — write each fused [BW, TV] tile into a VMEM scratch and
        #     run ONE W-pass extract-max over the full [BW, Vp] after the
        #     tile loop: the matmuls run back-to-back with no selection VPU
        #     chain between them, at +BW*Vp*4 bytes of VMEM
        run_vals = jnp.full((BW, W), BOTTOM, f32)
        run_tok = jnp.full((BW, W), BIG_IDX, f32)
        m_lse = [jnp.full((BW, 1), BOTTOM, f32) for _ in range(n_dec)]
        s_lse = [jnp.zeros((BW, 1), f32) for _ in range(n_dec)]
        h_wd = [hs[d].astype(wdtype) for d in range(n_dec)]
        n_v = dims[0][9]
        TV = dims[0][8]
        if resident:
            # Full-width projection per decoder, exact lse in one pass, then
            # ONE W-pass extract-max over the fused [BW, Vp] — no tile loop,
            # no DMA, no interleaved selection chains.  Padded cols carry
            # -inf bias so they never win; tie-break by min token index.
            Vp_full = n_v * TV
            fused = jnp.zeros((BW, Vp_full), f32)
            for d in range(n_dec):
                b_out_ref = dec_refs[d][6]
                logits = (jnp.dot(h_wd[d], wout_hbm[d][:],
                                  preferred_element_type=f32) + b_out_ref[:])
                mloc = jnp.max(logits, axis=1, keepdims=True)
                m_lse[d] = mloc
                s_lse[d] = jnp.sum(jnp.exp(logits - mloc), axis=1,
                                   keepdims=True)
                fused = fused + logits
            cvals = fused
            cidx = jax.lax.broadcasted_iota(
                jnp.int32, (BW, Vp_full), 1).astype(f32)
            nv_, nt_ = [], []
            for _ in range(W):
                mm = jnp.max(cvals, axis=1, keepdims=True)
                sel = jnp.min(jnp.where(cvals == mm, cidx, BIG_IDX),
                              axis=1, keepdims=True)
                nv_.append(mm)
                nt_.append(sel)
                cvals = jnp.where(cidx == sel, BOTTOM, cvals)
            run_vals = jnp.concatenate(nv_, axis=1)
            run_tok = jnp.concatenate(nt_, axis=1)
        for j in range(0 if resident else n_v):
            slot, nxt = j % 2, (j + 1) % 2
            for d in range(n_dec):
                if j + 1 < n_v:
                    wout_dma(d, nxt, j + 1).start()
                else:
                    wih_dma(d, 0, 0).start()       # next step's first gate tile
                wout_dma(d, slot, j).wait()
            fused = jnp.zeros((BW, TV), f32)
            for d in range(n_dec):
                b_out_ref = dec_refs[d][6]
                logits = (
                    jnp.dot(h_wd[d], wout_buf[d][slot], preferred_element_type=f32)
                    + b_out_ref[:, j * TV:(j + 1) * TV]
                )                                                        # [BW, TV]
                mloc = jnp.max(logits, axis=1, keepdims=True)
                mnew = jnp.maximum(m_lse[d], mloc)
                s_lse[d] = (
                    s_lse[d] * jnp.exp(m_lse[d] - mnew)
                    + jnp.sum(jnp.exp(logits - mnew), axis=1, keepdims=True)
                )
                m_lse[d] = mnew
                fused = fused + logits
            if topw == "stored":
                fused_scr[:, j * TV:(j + 1) * TV] = fused
                continue
            tokio = jax.lax.broadcasted_iota(jnp.int32, (BW, TV), 1).astype(f32) + float(j * TV)
            cvals = jnp.concatenate([run_vals, fused], axis=1)
            cidx = jnp.concatenate([run_tok, tokio], axis=1)
            nv_, nt_ = [], []
            for _ in range(W):
                mm = jnp.max(cvals, axis=1, keepdims=True)
                sel = jnp.min(jnp.where(cvals == mm, cidx, BIG_IDX), axis=1, keepdims=True)
                nv_.append(mm)
                nt_.append(sel)
                cvals = jnp.where(cidx == sel, BOTTOM, cvals)
            run_vals = jnp.concatenate(nv_, axis=1)
            run_tok = jnp.concatenate(nt_, axis=1)
        if topw == "stored" and not resident:
            Vp_full = n_v * TV
            cvals = fused_scr[:]                                         # [BW, Vp]
            cidx = jax.lax.broadcasted_iota(jnp.int32, (BW, Vp_full), 1).astype(f32)
            nv_, nt_ = [], []
            for _ in range(W):
                mm = jnp.max(cvals, axis=1, keepdims=True)
                sel = jnp.min(jnp.where(cvals == mm, cidx, BIG_IDX), axis=1, keepdims=True)
                nv_.append(mm)
                nt_.append(sel)
                cvals = jnp.where(cidx == sel, BOTTOM, cvals)
            run_vals = jnp.concatenate(nv_, axis=1)
            run_tok = jnp.concatenate(nt_, axis=1)

        # ---- 5. beam bookkeeping (models/beam.py step semantics) ----
        lse = m_lse[0] + jnp.log(s_lse[0])
        for d in range(1, n_dec):
            lse = lse + m_lse[d] + jnp.log(s_lse[d])
        logp5 = run_vals - lse                                           # [BW, W]
        cand5 = jnp.where(fin > 0, cum, cum + logp5)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (BW, W), 1).astype(f32)
        tok5 = jnp.where(fin > 0, iota_w, run_tok)
        tplus = (t + 1).astype(f32)
        if alpha:
            lens = jnp.where(fin > 0, eoslen, tplus)
            normv = jnp.exp(alpha * jnp.log(5.0 + lens)) * float(6.0 ** -alpha)
            cand5n = cand5 / normv
        else:
            cand5n = cand5
        gidx5 = row_beam * float(V) + tok5                               # flat w*V+tok

        gmat = jnp.concatenate([cand5n, cand5, tok5, gidx5], axis=1)     # [BW, 4W]
        pall = jnp.dot(pick_all, gmat, preferred_element_type=f32)       # [W*B, 4W]
        parts = [pall[k * B:(k + 1) * B] for k in range(W)]
        vals25 = jnp.concatenate([p[:, 0 * W:1 * W] for p in parts], axis=1)  # [B, W*W]
        cand25 = jnp.concatenate([p[:, 1 * W:2 * W] for p in parts], axis=1)
        tok25 = jnp.concatenate([p[:, 2 * W:3 * W] for p in parts], axis=1)
        gidx25 = jnp.concatenate([p[:, 3 * W:4 * W] for p in parts], axis=1)

        sel_rows = []                                                    # per k: [B, 3]
        for _ in range(W):
            mm = jnp.max(vals25, axis=1, keepdims=True)
            sg = jnp.min(jnp.where(vals25 == mm, gidx25, BIG_IDX), axis=1, keepdims=True)
            match = gidx25 == sg
            tk = jnp.sum(jnp.where(match, tok25, 0.0), axis=1, keepdims=True)
            uc = jnp.sum(jnp.where(match, cand25, 0.0), axis=1, keepdims=True)
            # sg - tk == w*V exactly, but XLA strength-reduces /V into
            # *(1/V) whose product can land half-an-ulp off an integer
            # (w=3, V=4000: 12000*fl(1/4000) rounds to 3+2^-22) — and the
            # permutation's equality match below needs exact integers.
            wf = jnp.floor((sg - tk) / float(V) + 0.5)
            sel_rows.append(jnp.concatenate([tk, wf, uc], axis=1))
            vals25 = jnp.where(match, BOTTOM, vals25)

        sel_cat = jnp.concatenate(sel_rows, axis=1)                      # [B, 3W]
        scat_all = jnp.dot(prep_f, sel_cat, preferred_element_type=f32)  # [BW, 3W]
        scat = jnp.zeros((BW, 3), f32)
        for k in range(W):
            scat = scat + (scat_all[:, 3 * k:3 * (k + 1)]
                           * (row_beam == float(k)).astype(f32))
        newtok = scat[:, 0:1]
        wsel = scat[:, 1:2]
        newcum = scat[:, 2:3]

        perm = ((col_clip == row_clip).astype(f32)
                * (col_beam == wsel).astype(f32))                        # [BW, BW]
        for d in range(n_dec):
            hs[d] = jnp.dot(perm, hs[d], preferred_element_type=f32)
            cs[d] = jnp.dot(perm, cs[d], preferred_element_type=f32)
        hist_r = jnp.dot(perm, hist, preferred_element_type=f32)
        fin_r = jnp.dot(perm, fin, preferred_element_type=f32)
        eos_r = jnp.dot(perm, eoslen, preferred_element_type=f32)

        iseos = (newtok == float(eos_id)).astype(f32)
        fin_new = jnp.maximum(fin_r, iseos)
        eos_new = jnp.where(fin_r > 0, eos_r, jnp.where(iseos > 0, tplus, 0.0))
        lcol = jax.lax.broadcasted_iota(jnp.int32, (BW, L), 1)
        hist_new = jnp.where(lcol == t, newtok, hist_r)

        return (t + 1, began_allfin, newtok, tuple(hs), tuple(cs),
                newcum, fin_new, eos_new, hist_new)

    # ---- init + warm-up + loop + drain ----
    if not resident:
        for d in range(n_dec):
            wih_dma(d, 0, 0).start()

    prev0 = jnp.full((BW, 1), float(sos_id), f32)
    hs0 = tuple(jnp.zeros((BW, dims[d][1]), f32) for d in range(n_dec))
    cs0 = tuple(jnp.zeros((BW, dims[d][1]), f32) for d in range(n_dec))
    cum0 = jnp.where(row_beam == 0.0, jnp.float32(0.0), jnp.float32(NEG_INF))
    fin0 = jnp.zeros((BW, 1), f32)
    eos0 = jnp.zeros((BW, 1), f32)
    hist0 = jnp.zeros((BW, L), f32)

    carry = jax.lax.while_loop(
        lambda c: jnp.logical_and(c[0] < L, jnp.logical_not(c[1])),
        step,
        (jnp.int32(0), jnp.bool_(False),
         prev0, hs0, cs0, cum0, fin0, eos0, hist0),
    )
    hist_ref[:] = carry[8]

    if not resident:
        for d in range(n_dec):              # drain the final step's prefetches
            wih_dma(d, 0, 0).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_caption_len", "beam_width", "beam_alpha", "tile_g", "tile_v",
        "weight_dtype", "interpret", "vmem_limit_mb", "rnn_types", "topw",
        "resident",
    ),
)
def beam_decode_pallas(
    decoder_params: Sequence[dict],           # 1 (single) or 2 (dual) decoders
    feats_list: Sequence[jnp.ndarray],        # matching [B, T, F_d] features
    feat_mask: Optional[jnp.ndarray] = None,  # [B, T] bool
    max_caption_len: int = 30,
    beam_width: int = 5,
    beam_alpha: float = 0.0,
    # None = auto: prefer g512/v2048 (measured best at the headline shape,
    # 3.07 vs 3.13 ms for g256/v1024; the whole sweep spans 3.07-3.18 ms —
    # latency-chain bound, BENCH_NOTES round 4), shrinking to g256/v1024
    # when the bigger double-buffers would blow the VMEM budget (e.g. W=10).
    tile_g: Optional[int] = None,
    tile_v: Optional[int] = None,
    weight_dtype: str = "bfloat16",
    interpret: bool = False,
    vmem_limit_mb: int = 64,
    rnn_types: tuple = ("LSTM", "LSTM"),
    topw: str = "streaming",
    resident: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused beam search over joint (summed) decoder log-probs -> token ids
    ``[B, max_caption_len + 2]`` beginning with SOS — the same contract as
    ``models.beam.beam_search`` driving ``decoder_beam_step``.

    ``decoder_params`` is a list of ``init_decoder`` trees with matching
    ``rnn_types`` ("LSTM"/"GRU" per decoder, mixed allowed); the dual model
    passes ``[v_decoder, a_decoder]`` with ``[visual, audio]`` features.
    Weights stream as ``weight_dtype`` tiles (bf16 perf path, f32 for parity
    tests); all state and scoring accumulate in f32.

    ``resident=True`` opts into the resident-weight kernel (every decoder's
    full [wi;wh]/wout in VMEM for all steps — no per-step weight DMA,
    full-width gate/vocab matmuls, one-pass lse and a single W-pass top-W).
    Unlike the greedy/dual kernels it is NOT auto-selected: measured on one
    v5e it never beat the streaming kernel (0.99x at B=64/W=5 — BENCH_NOTES
    round 4b), whose selection chains already overlap the weight DMA.
    ``topw`` only applies to the streaming kernel.  Token-identical either
    way (tests/test_pallas.py).
    """
    n_dec = len(decoder_params)
    assert n_dec == len(feats_list) and n_dec >= 1
    B, T, _ = feats_list[0].shape
    W = int(beam_width)
    BW = B * W
    L = int(max_caption_len) + 1              # scan steps (models/beam.py Lh)
    wd = jnp.dtype(weight_dtype)
    f32 = jnp.float32

    if tile_g is None or tile_v is None:
        # Auto tile selection: the measured-best big tiles when their bigger
        # double-buffers keep the residency estimate inside the budget
        # (headline shapes), else the minimal config (W=10-class shapes).
        big_ok = fits_vmem(
            decoder_params, feats_list, beam_width=W,
            weight_dtype=weight_dtype, rnn_types=tuple(rnn_types),
            tile_g=512, tile_v=2048,
        )
        tile_g, tile_v = (512, 2048) if big_ok else (256, 1024)

    V = decoder_params[0]["embedding"]["table"].shape[0]
    TV = min(int(tile_v), _round_up(V, 128))
    Vp = _round_up(V, TV)
    n_v = Vp // TV

    # --- shared aux index arrays (host-built: no vector int div in-kernel) ---
    r = np.arange(BW)
    row_clip = jnp.asarray((r // W).astype(np.float32)[:, None])
    row_beam = jnp.asarray((r % W).astype(np.float32)[:, None])
    col_clip = jnp.asarray((r // W).astype(np.float32)[None, :])
    col_beam = jnp.asarray((r % W).astype(np.float32)[None, :])
    stk_clip = jnp.asarray((r % B).astype(np.float32)[:, None])   # row k*B+b -> b
    stk_beam = jnp.asarray((r // B).astype(np.float32)[:, None])  # row k*B+b -> k
    featcol_clip = jnp.asarray((np.arange(B * T) // T).astype(np.float32)[None, :])
    mask = (
        feat_mask.astype(f32) if feat_mask is not None
        else jnp.ones((B, T), f32)
    )

    # --- chunk factors (attention energies / context) ---
    A0 = decoder_params[0]["attention"]["W"].shape[1]
    kk = max(1, min(B, 2048 // max(T, 1)))
    while B % kk:
        kk -= 1
    CR = kk * T

    # --- per-decoder packed operands ---
    dims = []
    vmem_ins = [mask, row_clip, row_beam, col_clip, col_beam,
                stk_clip, stk_beam, featcol_clip]
    weights_full = []       # per decoder (wih_p, wout_p) — tiled only if streaming
    res_bytes = B * T * 4 + BW * Vp * 4        # mask + one-hot intermediate
    emb_blocks = []
    eoff = 0
    for d, (params, feats) in enumerate(zip(decoder_params, feats_list)):
        cell = rnn_types[d]
        emb = params["embedding"]["table"]
        assert emb.shape[0] == V, "all decoders must share the vocabulary"
        E = emb.shape[1]
        wi, wh = params["rnn"]["wi"], params["rnn"]["wh"]
        K1, H4 = wi.shape
        H = H4 // (4 if cell == "LSTM" else 3)
        F = feats.shape[2]
        ap = params["attention"]
        A = ap["W"].shape[1]
        assert A == A0, "attention bottleneck must match across decoders"

        TG = int(tile_g)
        if H % TG or TG > H:
            TG = H
        n_g = H4 // TG
        factored = _use_factored(B * T, F, H4)
        if factored:
            Kp = _round_up(E + H, 256) if cell == "LSTM" else _round_up(E, 256)
        else:
            Kp = _round_up(F + E + H, 256) if cell == "LSTM" else _round_up(F + E, 256)

        feats_h = feats.astype(wd)
        keys = (feats_h @ ap["U"].astype(wd)).reshape(B, T * A).astype(wd)
        w_row = ap["w"].astype(f32).reshape(1, A)

        # x layout [context | embedded (| h)]; decoder x = [embedded, context].
        # LSTM streams fused [wi; wh]; GRU streams wi only (its n-gate keeps
        # the recurrent bias inside the reset product, so wh stays VMEM-
        # resident and h-side gates are computed against it in-kernel).
        # A FACTORED decoder drops the context rows from the stream — their
        # contribution arrives via P = feats @ wi_ctx (in-kernel ctxg).
        wi_ctx = wi[E:]                                  # [F, H4] context rows
        if cell == "LSTM":
            rows = ([wi[:E], wh] if factored else [wi_ctx, wi[:E], wh])
            wih = jnp.concatenate(rows, axis=0).astype(wd)
            wih_p = jnp.zeros((Kp, H4), wd).at[: wih.shape[0]].set(wih)
            wh_vm = jnp.zeros((8, 128), wd)              # unused placeholder
            b_gates = (params["rnn"]["bi"] + params["rnn"]["bh"]).astype(f32).reshape(1, H4)
            b_h = jnp.zeros((1, H4), f32)
        else:
            rows = ([wi[:E]] if factored else [wi_ctx, wi[:E]])
            wih = jnp.concatenate(rows, axis=0).astype(wd)
            wih_p = jnp.zeros((Kp, H4), wd).at[: wih.shape[0]].set(wih)
            wh_vm = wh.astype(wd)                        # [H, 3H] resident
            b_gates = params["rnn"]["bi"].astype(f32).reshape(1, H4)
            b_h = params["rnn"]["bh"].astype(f32).reshape(1, H4)
        wout = params["out"]["w"]
        wout_p = jnp.zeros((H, Vp), wd).at[:, :V].set(wout.astype(wd))
        b_out = jnp.full((1, Vp), -1e30, f32).at[0, :V].set(
            params["out"]["b"].astype(f32)
        )
        if factored:
            # bf16 dots accumulate in f32 on the MXU; P is stored back in wd.
            slab = jnp.dot(feats_h.reshape(B * T, F), wi_ctx.astype(wd),
                           preferred_element_type=f32).astype(wd)  # [B*T, H4]
        else:
            slab = feats_h.reshape(B * T, F)
        vmem_ins += [
            slab,
            keys,
            w_row,
            ap["W"].astype(wd),
            ap["b"].astype(f32).reshape(1, A),
            b_gates,
            b_out,
            wh_vm,
            b_h,
        ]
        weights_full.append((wih_p, wout_p))
        # resident residency: slab + keys + full weights + live f32 logits,
        # wh for GRU, plus the dominant activations (same terms fits_vmem
        # charges, with the full weight set in place of the double-buffers)
        res_bytes += (B * T * (slab.shape[1] + A)
                      + Kp * H4 + H * Vp) * wd.itemsize
        if cell == "GRU":
            res_bytes += H * H4 * wd.itemsize
        res_bytes += BW * Vp * 4 * 2           # per-dec logits + running fused
        res_bytes += 4 * BW * (Kp + H4 + H) + 4 * BW * T * A
        emb_blocks.append((emb, E))
        dims.append((F, H, A, E, eoff, Kp, TG, n_g, TV, n_v, cell, factored))
        eoff += E

    # --- concatenated embedding tables, VMEM-resident (Vp x Ecat_p is a
    # few MB; streaming cost HBM traffic and a step-start DMA bubble) ---
    ecat = sum(E for _, E in emb_blocks)
    ecat_p = _round_up(ecat, 128)
    emb_cat = jnp.zeros((Vp, ecat_p), wd)
    off = 0
    for emb, E in emb_blocks:
        emb_cat = emb_cat.at[:V, off:off + E].set(emb.astype(wd))
        off += E
    vmem_ins = vmem_ins[:8] + [emb_cat] + vmem_ins[8:]
    res_bytes += Vp * ecat_p * wd.itemsize

    if resident is None:
        # Measured NULL result (scripts/bench_resident.py, BENCH_NOTES round
        # 4b): unlike greedy/dual, beam resident never beat streaming on one
        # v5e (0.99x at B=64/W=5, 0.95x at B=32/W=5) — the W-pass top-W over
        # the full [B*W, Vp] f32 logits costs more VPU time than the weight
        # DMA it removes, and the streaming kernel already overlaps that DMA
        # with its selection chains.  Auto therefore always streams; resident
        # stays an explicit, parity-tested knob.
        resident = False
    elif resident:
        # Explicit resident=True skips the fit heuristic; past ~3/4 of the
        # 128 MiB v5e VMEM the Mosaic compile fails outright instead of
        # falling back, so surface the estimate up front.
        import warnings

        if res_bytes * 4 // 3 >= 128 * 1024 * 1024:
            warnings.warn(
                f"beam resident=True with ~{res_bytes / 2**20:.0f} MiB of "
                "VMEM-resident state (fit estimate exceeds the 128 MiB v5e "
                "capacity) — expect a Mosaic compile failure; use "
                "resident=None/False to stream instead",
                stacklevel=2,
            )

    assert topw in ("streaming", "stored"), topw
    hbm_ins = []
    scratch = []
    if resident:
        for wih_p, wout_p in weights_full:
            vmem_ins += [wih_p, wout_p]
    else:
        for (wih_p, wout_p), dd in zip(weights_full, dims):
            Kp_d, TG_d, n_g_d = dd[5], dd[6], dd[7]
            H_d = dd[1]
            hbm_ins += [
                wih_p.reshape(Kp_d, n_g_d, TG_d).transpose(1, 0, 2),
                wout_p.reshape(H_d, n_v, TV).transpose(1, 0, 2),
            ]
            scratch += [
                pltpu.VMEM((2, Kp_d, TG_d), wd),
                pltpu.VMEM((2, H_d, TV), wd),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        if topw == "stored":
            scratch.append(pltpu.VMEM((BW, Vp), f32))
    kernel = functools.partial(
        _beam_kernel,
        dims=tuple(dims), B=B, T=T, W=W, V=V, L=L,
        alpha=float(beam_alpha),
        CR=CR, sos_id=SOS_ID, eos_id=EOS_ID,
        topw=topw, resident=resident,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec(memory_space=pl.ANY)

    kwargs = {}
    if not interpret:
        cp_cls = getattr(pltpu, "CompilerParams", None) or getattr(
            pltpu, "TPUCompilerParams", None
        )
        if cp_cls is not None:
            # resident mode holds the full weight set as scoped VMEM
            # allocations — a streaming-sized cap would spuriously OOM it
            # (pallas_dual_greedy saw 58.6 MB wanted vs a 48 MB cap), so it
            # gets the full v5e capacity.  For beam, resident is never
            # auto-selected (measured NULL above) — only reached via the
            # explicit knob, which warns on an over-capacity res_bytes fit.
            lim = (128 << 20) if resident else int(vmem_limit_mb) << 20
            kwargs["compiler_params"] = cp_cls(vmem_limit_bytes=lim)

    flops_step = sum(
        2 * BW * (dd[5] * dd[6] * dd[7] + dd[1] * Vp) + 2 * BW * BW * dd[1]
        + (2 * BW * B * T * dd[6] * dd[7] if dd[11] else 0)   # factored ctxg
        for dd in dims
    )
    hist = pl.pallas_call(
        kernel,
        in_specs=[vspec] * len(vmem_ins) + [hspec] * len(hbm_ins),
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((BW, L), f32),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=L * flops_step,
            # resident: every operand read from HBM exactly once; streaming:
            # the wih/wout tiles re-stream every step
            bytes_accessed=(
                res_bytes if resident else L * sum(
                    dd[5] * dd[6] * dd[7] + dd[1] * Vp for dd in dims
                ) * wd.itemsize
            ),
            transcendentals=L * BW * sum(4 * dd[1] + T * dd[2] for dd in dims),
        ),
        **kwargs,
    )(*vmem_ins, *hbm_ins)

    tokens = hist.reshape(B, W, L)[:, 0].astype(jnp.int32)               # beam 0
    sos = jnp.full((B, 1), SOS_ID, jnp.int32)
    return jnp.concatenate([sos, tokens], axis=1)                        # [B, L+1]
