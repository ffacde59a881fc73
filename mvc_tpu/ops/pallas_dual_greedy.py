"""Fused whole-sentence DUAL-decoder greedy decode as ONE Pallas TPU kernel.

The dual model's direct mode (reference src/models/captioning.py:279-288)
free-runs each decoder on its OWN per-step argmax while the reported token
stream argmaxes the FUSED (summed) log-probs — so a width-1 beam does NOT
match (the beam would feed the joint token back into both decoders).  The
XLA path is models/captioning.py `dual_decode_fused` + `greedy_tokens(v+a)`;
this kernel runs the whole thing in one pallas_call, extending
ops/pallas_decode.py to two decoders:

- per decoder, small state stays in VMEM for all L steps (features, attention
  keys, embedding table, ``wh``, biases); ``wi`` and ``wout`` stream from HBM
  as double-buffered tiles
- both decoders share the vocab tiling, so each vocab tile yields both
  decoders' logits at once; three running (max, argmax) streams are kept —
  one per decoder (its greedy feed: argmax(logits_d) == argmax(logp_d),
  log-softmax is monotone) and one for the fused stream
  (argmax(l_v + l_a) == argmax(logp_v + logp_a): the per-row lse shift is
  constant)
- all loops are fully unrolled (static offsets), like the single kernel

Exact token parity vs the XLA dual direct path is asserted in
tests/test_pallas.py (f32 weights, interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvc_tpu.ops._gates import apply_gate_tile
from mvc_tpu.ops.pallas_beam import _use_factored
from mvc_tpu.ops.pallas_decode import _attn_wsum, _embed_prev


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dual_kernel(*refs, dims, B, T, L, n_v, TV, sos_id):
    """dims: per-decoder (F, H, A, E, Kp, TG, n_g, cell, factored).

    A factored decoder's feats slot holds P = feats @ wi_ctx time-major
    ([T, B, G*H]): the attention-weighted slab sum yields the context rows'
    gate preactivation directly and context drops out of the wi stream
    (see pallas_beam._use_factored)."""
    n_dec = len(dims)
    f32 = jnp.float32

    # ---- ref parsing (wrapper order) ----
    mask_ref = refs[0]
    dec_refs = [refs[1 + 10 * d: 1 + 10 * (d + 1)] for d in range(n_dec)]
    nin = 1 + 10 * n_dec
    wi_hbm = [refs[nin + 2 * d] for d in range(n_dec)]
    wout_hbm = [refs[nin + 2 * d + 1] for d in range(n_dec)]
    tokens_ref = refs[nin + 2 * n_dec]
    scr = refs[nin + 2 * n_dec + 1:]
    wi_buf = [scr[4 * d] for d in range(n_dec)]
    wout_buf = [scr[4 * d + 1] for d in range(n_dec)]
    wi_sem = [scr[4 * d + 2] for d in range(n_dec)]
    wout_sem = [scr[4 * d + 3] for d in range(n_dec)]
    wdtype = wi_buf[0].dtype

    def wi_dma(d, slot, j):
        return pltpu.make_async_copy(wi_hbm[d].at[j], wi_buf[d].at[slot], wi_sem[d].at[slot])

    def wout_dma(d, slot, j):
        return pltpu.make_async_copy(wout_hbm[d].at[j], wout_buf[d].at[slot], wout_sem[d].at[slot])

    hs = [jnp.zeros((B, dims[d][1]), f32) for d in range(n_dec)]
    cs = [jnp.zeros((B, dims[d][1]), f32) for d in range(n_dec)]
    prevs = [jnp.full((B, 1), sos_id, jnp.int32) for _ in range(n_dec)]
    mask = mask_ref[:]

    for d in range(n_dec):
        wi_dma(d, 0, 0).start()            # warm up both gate streams

    for t in range(L):
        xs = []
        ctxgs = []
        for d in range(n_dec):
            F, H, A, E, Kp, TG, n_g, cell, factored = dims[d]
            (feats_ref, keys2_ref, wrow_ref, emb_ref, attn_w_ref,
             attn_b_ref, _, b_gates_ref, _, b_out_ref) = dec_refs[d]
            Vp = emb_ref.shape[0]

            # ---- 1. embedding of THIS decoder's own previous token
            iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
            onehot = (iota_v == prevs[d]).astype(wdtype)
            embedded = jnp.dot(onehot, emb_ref[:], preferred_element_type=f32)

            # ---- 2. additive attention (same scheme as ops/pallas_decode.py)
            q = jnp.dot(hs[d].astype(wdtype), attn_w_ref[:],
                        preferred_element_type=f32) + attn_b_ref[:]
            e_all = jnp.tanh(keys2_ref[:].astype(f32).reshape(B, T, A)
                             + q[:, None, :])
            energies = jnp.sum(e_all * wrow_ref[:].reshape(1, 1, A), axis=2)
            neg = jnp.float32(-1e30)
            energies = jnp.where(mask > 0, energies, neg)
            m = jnp.max(energies, axis=1, keepdims=True)
            m = jnp.where(m > neg / 2, m, 0.0)
            unnorm = jnp.where(mask > 0, jnp.exp(energies - m), 0.0)
            denom = jnp.maximum(jnp.sum(unnorm, axis=1, keepdims=True), 1e-30)
            weights = unnorm / denom

            ncol = feats_ref.shape[2]          # F (direct) or G*H (factored)
            wsum = jnp.zeros((B, ncol), f32)
            for tt in range(T):
                wsum = wsum + weights[:, tt:tt + 1] * feats_ref[tt].astype(f32)

            if factored:
                ctxgs.append(wsum)
                parts = [embedded.astype(wdtype)]
                pad = Kp - E
            else:
                ctxgs.append(None)
                parts = [wsum.astype(wdtype), embedded.astype(wdtype)]
                pad = Kp - (F + E)
            if pad:
                parts.append(jnp.zeros((B, pad), wdtype))
            xs.append(jnp.concatenate(parts, axis=1))            # [B, Kp]

        # ---- 3. gates per decoder from its double-buffered wi stream
        # (torch gate order: LSTM i,f,g,o; GRU r,z,n with the recurrent
        # n-bias kept inside the reset product)
        for d in range(n_dec):
            F, H, A, E, Kp, TG, n_g, cell, factored = dims[d]
            wh_ref, b_gates_ref, b_h_ref = (
                dec_refs[d][6], dec_refs[d][7], dec_refs[d][8])
            x, h_prev = xs[d], hs[d].astype(wdtype)
            h_f32 = hs[d]
            tpg = H // TG
            i_parts, g_parts = [None] * tpg, [None] * tpg
            c_parts = [cs[d][:, k * TG:(k + 1) * TG] for k in range(tpg)]
            h_parts = [None] * tpg
            for j in range(n_g):
                slot, nxt = j % 2, (j + 1) % 2
                if j + 1 < n_g:
                    wi_dma(d, nxt, j + 1).start()
                else:
                    wout_dma(d, 0, 0).start()
                wi_dma(d, slot, j).wait()
                col = j * TG
                gate_id, k = col // H, (col % H) // TG
                gh = (jnp.dot(h_prev, wh_ref[:, col:col + TG],
                              preferred_element_type=f32)
                      + (b_h_ref[:, col:col + TG] if cell == "GRU" else 0.0))
                gv = (jnp.dot(x, wi_buf[d][slot], preferred_element_type=f32)
                      + b_gates_ref[:, col:col + TG])
                if factored:
                    gv = gv + ctxgs[d][:, col:col + TG]
                if cell == "LSTM":
                    gv = gv + gh                                 # fused preact
                apply_gate_tile(cell, gate_id, k, gv, gh, i_parts, g_parts,
                                c_parts, h_parts, h_f32, TG)
            if cell == "LSTM":
                cs[d] = jnp.concatenate(c_parts, axis=1)
            hs[d] = jnp.concatenate(h_parts, axis=1)

        # ---- 4. shared-tiling vocab projection: per-decoder AND fused
        # running (max, argmax) — three streams, one pass over the tiles
        own_val = [jnp.full((B, 1), -jnp.inf, f32) for _ in range(n_dec)]
        own_idx = [jnp.zeros((B, 1), jnp.int32) for _ in range(n_dec)]
        fus_val = jnp.full((B, 1), -jnp.inf, f32)
        fus_idx = jnp.zeros((B, 1), jnp.int32)
        h_wd = [hs[d].astype(wdtype) for d in range(n_dec)]
        for j in range(n_v):
            slot, nxt = j % 2, (j + 1) % 2
            for d in range(n_dec):
                if j + 1 < n_v:
                    wout_dma(d, nxt, j + 1).start()
                elif t + 1 < L:
                    wi_dma(d, 0, 0).start()        # next step's gate stream
                wout_dma(d, slot, j).wait()
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (B, TV), 1) + j * TV
            fused = jnp.zeros((B, TV), f32)
            for d in range(n_dec):
                b_out_ref = dec_refs[d][9]
                logits = (
                    jnp.dot(h_wd[d], wout_buf[d][slot], preferred_element_type=f32)
                    + b_out_ref[:, j * TV:(j + 1) * TV]
                )
                fused = fused + logits
                loc_max = jnp.max(logits, axis=1, keepdims=True)
                loc_arg = jnp.min(
                    jnp.where(logits == loc_max, iota_t, jnp.int32(2**30)),
                    axis=1, keepdims=True,
                )
                better = loc_max > own_val[d]      # lowest-index tie-break
                own_idx[d] = jnp.where(better, loc_arg, own_idx[d])
                own_val[d] = jnp.where(better, loc_max, own_val[d])
            loc_max = jnp.max(fused, axis=1, keepdims=True)
            loc_arg = jnp.min(
                jnp.where(fused == loc_max, iota_t, jnp.int32(2**30)),
                axis=1, keepdims=True,
            )
            better = loc_max > fus_val
            fus_idx = jnp.where(better, loc_arg, fus_idx)
            fus_val = jnp.where(better, loc_max, fus_val)

        prevs = own_idx
        tokens_ref[:, t:t + 1] = fus_idx


def _dual_kernel_resident(*refs, dims, B, T, L, Vp, sos_id):
    """Resident-weight variant of ``_dual_kernel`` (see
    pallas_decode._decode_kernel_resident): every decoder's wi/wout is a
    VMEM-resident input read from HBM once by the pallas_call prologue, and
    each step runs full-width matmuls — no per-step weight DMA, no
    semaphores.  ``dims`` has the same per-decoder layout (TG/n_g unused).
    Token-identical to the streaming kernel."""
    n_dec = len(dims)
    f32 = jnp.float32

    mask_ref = refs[0]
    dec_refs = [refs[1 + 10 * d: 1 + 10 * (d + 1)] for d in range(n_dec)]
    nin = 1 + 10 * n_dec
    wi_ref = [refs[nin + 2 * d] for d in range(n_dec)]
    wout_ref = [refs[nin + 2 * d + 1] for d in range(n_dec)]
    tokens_ref = refs[nin + 2 * n_dec]
    wdtype = wi_ref[0].dtype

    hs = [jnp.zeros((B, dims[d][1]), f32) for d in range(n_dec)]
    cs = [jnp.zeros((B, dims[d][1]), f32) for d in range(n_dec)]
    prevs = [jnp.full((B, 1), sos_id, jnp.int32) for _ in range(n_dec)]

    for t in range(L):
        # ---- 1+2. per-decoder embedding of its OWN previous token and
        # additive attention (shared phase helpers with the single kernel)
        xs, ctxgs = [], []
        for d in range(n_dec):
            F, H, A, E, Kp, _TG, _ng, cell, factored = dims[d]
            (feats_ref, keys2_ref, wrow_ref, emb_ref, attn_w_ref,
             attn_b_ref, _, _, _, _) = dec_refs[d]
            embedded = _embed_prev(prevs[d], emb_ref, wdtype, B)
            wsum = _attn_wsum(hs[d], feats_ref, keys2_ref, wrow_ref, mask_ref,
                              attn_w_ref, attn_b_ref, A, wdtype)
            if factored:
                ctxgs.append(wsum)
                parts = [embedded.astype(wdtype)]
                pad = Kp - E
            else:
                ctxgs.append(None)
                parts = [wsum.astype(wdtype), embedded.astype(wdtype)]
                pad = Kp - (F + E)
            if pad:
                parts.append(jnp.zeros((B, pad), wdtype))
            xs.append(jnp.concatenate(parts, axis=1))            # [B, Kp]

        # ---- 3. gates per decoder: ONE full-width input matmul each
        for d in range(n_dec):
            F, H, A, E, Kp, _TG, _ng, cell, factored = dims[d]
            wh_ref, b_gates_ref, b_h_ref = (
                dec_refs[d][6], dec_refs[d][7], dec_refs[d][8])
            h_prev = hs[d].astype(wdtype)
            h_f32 = hs[d]
            gv_full = (jnp.dot(xs[d], wi_ref[d][:], preferred_element_type=f32)
                       + b_gates_ref[:])
            if factored:
                gv_full = gv_full + ctxgs[d]
            gh_full = jnp.dot(h_prev, wh_ref[:], preferred_element_type=f32)
            if cell == "GRU":
                gh_full = gh_full + b_h_ref[:]
            n_gates = 4 if cell == "LSTM" else 3
            i_parts, g_parts = [None], [None]
            c_parts, h_parts = [cs[d]], [None]
            for gate_id in range(n_gates):
                col = gate_id * H
                gv = gv_full[:, col:col + H]
                gh = gh_full[:, col:col + H]
                if cell == "LSTM":
                    gv = gv + gh                                 # fused preact
                apply_gate_tile(cell, gate_id, 0, gv, gh, i_parts, g_parts,
                                c_parts, h_parts, h_f32, H)
            if cell == "LSTM":
                cs[d] = c_parts[0]
            hs[d] = h_parts[0]

        # ---- 4. full-width vocab projections: per-decoder AND fused argmax
        # (padded cols carry -inf bias; lowest-index tie-break)
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
        fused = jnp.zeros((B, Vp), f32)
        own_idx = []
        for d in range(n_dec):
            b_out_ref = dec_refs[d][9]
            logits = (jnp.dot(hs[d].astype(wdtype), wout_ref[d][:],
                              preferred_element_type=f32) + b_out_ref[:])
            fused = fused + logits
            m = jnp.max(logits, axis=1, keepdims=True)
            own_idx.append(jnp.min(
                jnp.where(logits == m, iota_v, jnp.int32(2**30)),
                axis=1, keepdims=True))
        m = jnp.max(fused, axis=1, keepdims=True)
        fus_idx = jnp.min(
            jnp.where(fused == m, iota_v, jnp.int32(2**30)),
            axis=1, keepdims=True)

        prevs = own_idx
        tokens_ref[:, t:t + 1] = fus_idx


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_caption_len", "sos_id", "tile_g", "tile_v", "weight_dtype",
        "interpret", "vmem_limit_mb", "rnn_types", "resident", "batch_tile",
    ),
)
def dual_greedy_decode_pallas(
    decoder_params: Sequence[dict],            # [v_decoder, a_decoder]
    feats_list: Sequence[jnp.ndarray],         # [[B,T,Fv], [B,T,Fa]]
    feat_mask: Optional[jnp.ndarray] = None,   # [B, T] bool
    max_caption_len: int = 30,
    sos_id: int = 1,
    tile_g: int = 256,
    tile_v: int = 512,
    weight_dtype: str = "bfloat16",
    interpret: bool = False,
    vmem_limit_mb: int = 48,
    rnn_types: tuple = ("LSTM", "LSTM"),
    resident: Optional[bool] = None,
    batch_tile: Optional[int] = None,
) -> jnp.ndarray:
    """Fused dual-direct greedy -> tokens [B, max_caption_len], matching
    ``greedy_tokens(v_outputs + a_outputs)`` where each decoder free-runs on
    its own argmax (models/captioning.py AVCaptioningDual direct mode,
    replicating reference src/models/captioning.py:279-288).  Column 0 is
    the zero-row argmax (= 0), columns 1.. are the decode steps.

    ``resident=None`` auto-selects the resident-weight kernel (every
    decoder's wi/wout VMEM-resident for all steps; see
    pallas_decode._resident_fits for the measured batch crossover) when the
    whole operand set fits the fixed 128 MiB v5e capacity.

    ``vmem_limit_mb`` caps the STREAMING kernel's VMEM only.  Resident mode
    (auto-selected or explicit) always compiles against the full 128 MiB
    capacity — its weights are scoped VMEM allocations a streaming-sized cap
    would spuriously OOM — so lowering this knob for co-residency does not
    constrain (or deselect) the resident kernel; pass ``resident=False`` to
    force the capped streaming variant."""
    n_dec = len(decoder_params)
    assert n_dec == len(feats_list) and n_dec >= 1
    B, T, _ = feats_list[0].shape
    wd = jnp.dtype(weight_dtype)
    f32 = jnp.float32

    V = decoder_params[0]["embedding"]["table"].shape[0]
    TV = min(int(tile_v), _round_up(V, 128))
    Vp = _round_up(V, TV)
    n_v = Vp // TV

    L = int(max_caption_len) - 1
    assert L >= 1, "max_caption_len must be >= 2"

    mask = (
        feat_mask.astype(f32) if feat_mask is not None
        else jnp.ones((B, T), f32)
    )

    dims = []
    vmem_ins = [mask]
    weights_full = []          # per decoder (wi_p, wout_p) — tiled only if streaming
    res_bytes = B * T * 4      # resident-mode VMEM estimate (mask f32)
    for params, feats, cell in zip(decoder_params, feats_list, rnn_types):
        emb = params["embedding"]["table"]
        assert emb.shape[0] == V, "decoders must share the vocabulary"
        E = emb.shape[1]
        wi, wh = params["rnn"]["wi"], params["rnn"]["wh"]
        K1, H4 = wi.shape
        H = H4 // (4 if cell == "LSTM" else 3)
        F = feats.shape[2]
        ap = params["attention"]
        A = ap["W"].shape[1]

        TG = int(tile_g)
        if H % TG or TG > H:
            TG = H
        n_g = H4 // TG
        factored = _use_factored(B * T, F, H4)
        Kp = _round_up(E, 256) if factored else _round_up(K1, 256)

        feats_h = feats.astype(wd)
        keys2 = (feats_h @ ap["U"].astype(wd)).reshape(B, T * A).astype(wd)
        w_row = ap["w"].astype(f32).reshape(1, A)
        if factored:
            slab_tm = (
                jnp.dot(feats_h.reshape(B * T, F), wi[E:].astype(wd),
                        preferred_element_type=f32)
                .astype(wd).reshape(B, T, H4).transpose(1, 0, 2)
            )                                    # [T, B, H4] time-major
        else:
            slab_tm = feats_h.transpose(1, 0, 2)

        emb_p = jnp.zeros((Vp, E), wd).at[:V].set(emb.astype(wd))
        wi_x = (wi[:E] if factored
                else jnp.concatenate([wi[E:], wi[:E]], axis=0)).astype(wd)
        wi_p = jnp.zeros((Kp, H4), wd).at[:wi_x.shape[0]].set(wi_x)
        wout_p = jnp.zeros((H, Vp), wd).at[:, :V].set(params["out"]["w"].astype(wd))
        b_out = jnp.full((1, Vp), -1e30, f32).at[0, :V].set(
            params["out"]["b"].astype(f32)
        )
        res_bytes += (T * B * slab_tm.shape[2] + B * T * A + Vp * E
                      + H * H4 + Kp * H4 + H * Vp) * wd.itemsize
        res_bytes += 2 * B * Vp * 4 + 2 * B * H4 * 4  # one-hot/logits, gv/gh f32
        if cell == "LSTM":
            b_gates = (params["rnn"]["bi"] + params["rnn"]["bh"]).astype(f32).reshape(1, H4)
            b_h = jnp.zeros((1, H4), f32)
        else:
            b_gates = params["rnn"]["bi"].astype(f32).reshape(1, H4)
            b_h = params["rnn"]["bh"].astype(f32).reshape(1, H4)

        vmem_ins += [
            slab_tm,                             # [T, B, F|G*H] time-major
            keys2,
            w_row,
            emb_p,
            ap["W"].astype(wd),
            ap["b"].astype(f32).reshape(1, A),
            wh.astype(wd),
            b_gates,
            b_h,
            b_out,
        ]
        weights_full.append((wi_p, wout_p))
        dims.append((F, H, A, E, Kp, TG, n_g, cell, factored))

    if batch_tile is not None:
        # explicit knob: grid-tiled resident kernel at this tile size
        assert B % batch_tile == 0 and batch_tile < B, (
            f"batch_tile={batch_tile} must divide and be smaller than B={B}")
        resident = True
    elif resident is None:
        # VMEM fit only — NO batch crossover, unlike the single-decoder rule
        # (pallas_decode._resident_fits): with two decoders the streaming
        # kernel pays double the per-step DMA wait chains, and resident
        # measured faster at every batch tried on one v5e (1.131x at B=32,
        # 1.015x at B=64 — scripts/bench_resident.py, BENCH_NOTES round 4b)
        resident = res_bytes * 4 // 3 < 128 * 1024 * 1024
        if not resident:
            # Bulk batches: grid-tile the batch over the resident kernel —
            # weights load once (constant-index blocks), per-clip slabs
            # stream tile by tile (VERDICT r4 item 2).  res_bytes scales
            # linearly in B except the weight terms, and the Pallas pipeline
            # double-buffers the batch-blocked operands.
            from mvc_tpu.ops.pallas_decode import _pick_batch_tile

            w_bytes = sum(
                (Vp * E + H * H4 + Kp * H4 + H * Vp) * wd.itemsize
                for (F, H, A, E, Kp, TG, n_g, cell, fac) in dims)
            act_per_b = (res_bytes - w_bytes) / max(B, 1)

            def tile_fits(bt):
                return (w_bytes + 2 * bt * act_per_b) * 4 // 3 < 128 * 1024 * 1024

            batch_tile = _pick_batch_tile(B, tile_fits)
            resident = batch_tile is not None

    hbm_ins = []
    scratch = []
    grid_kwargs = {}
    if resident:
        for wi_p, wout_p in weights_full:
            vmem_ins += [wi_p, wout_p]
        Bt = batch_tile or B
        kernel = functools.partial(
            _dual_kernel_resident, dims=tuple(dims), B=Bt, T=T, L=L,
            Vp=Vp, sos_id=sos_id,
        )
        if batch_tile is not None:
            # Grid-tiled: weights are constant-index VMEM blocks (fetched
            # once, kept across grid steps); per-clip operands blocked on
            # the batch axis; Pallas double-buffers the moving blocks.
            def const(x):
                return pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim)

            tiled_specs = [pl.BlockSpec((Bt, T), lambda i: (i, 0))]  # mask
            for d, (F, H, A, E, Kp, TG, n_g, cell, fac) in enumerate(dims):
                slab, keys2 = vmem_ins[1 + 10 * d], vmem_ins[2 + 10 * d]
                tiled_specs += [
                    pl.BlockSpec((T, Bt, slab.shape[2]), lambda i: (0, i, 0)),
                    pl.BlockSpec((Bt, T * A), lambda i: (i, 0)),
                ] + [const(vmem_ins[3 + 10 * d + k]) for k in range(8)]
            tiled_specs += [const(x) for x in vmem_ins[1 + 10 * len(dims):]]
            grid_kwargs = dict(
                grid=(B // Bt,),
                tiled_in_specs=tiled_specs,
                tiled_out_specs=pl.BlockSpec((Bt, L), lambda i: (i, 0)),
            )
    else:
        for (wi_p, wout_p), (F, H, A, E, Kp, TG, n_g, cell, fac) in zip(
                weights_full, dims):
            hbm_ins += [
                wi_p.reshape(Kp, n_g, TG).transpose(1, 0, 2),
                wout_p.reshape(H, n_v, TV).transpose(1, 0, 2),
            ]
            scratch += [
                pltpu.VMEM((2, Kp, TG), wd),
                pltpu.VMEM((2, H, TV), wd),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        kernel = functools.partial(
            _dual_kernel, dims=tuple(dims), B=B, T=T, L=L,
            n_v=n_v, TV=TV, sos_id=sos_id,
        )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec(memory_space=pl.ANY)

    kwargs = {}
    if not interpret:
        cp_cls = getattr(pltpu, "CompilerParams", None) or getattr(
            pltpu, "TPUCompilerParams", None
        )
        if cp_cls is not None:
            # the resident kernel's VMEM-resident weights are scoped
            # allocations: the caller's streaming-sized cap would spuriously
            # OOM it (measured: Mosaic wants 58.6 MB at dual B=64 — more
            # than the operand estimate — vs the 48 MB default), so resident
            # mode gets the full v5e capacity; the auto rule already gated
            # on the residency estimate
            lim = (128 << 20) if resident else int(vmem_limit_mb) << 20
            kwargs["compiler_params"] = cp_cls(vmem_limit_bytes=lim)

    if grid_kwargs:
        in_specs = grid_kwargs["tiled_in_specs"]
        out_specs = grid_kwargs["tiled_out_specs"]
        kwargs["grid"] = grid_kwargs["grid"]
    else:
        in_specs = [vspec] * len(vmem_ins) + [hspec] * len(hbm_ins)
        out_specs = vspec
    tokens = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * L * B * sum(
                Kp * 4 * H + H * 4 * H + H * Vp + Vp * E + T * A
                for (F, H, A, E, Kp, TG, n_g, cell, _fac) in dims
            ),
            # resident: every operand read from HBM exactly once; streaming:
            # the wi/wout tiles re-stream every step
            bytes_accessed=(
                res_bytes if resident else L * sum(
                    (Kp * TG * n_g + H * Vp)
                    for (F, H, A, E, Kp, TG, n_g, cell, _fac) in dims
                ) * wd.itemsize
            ),
            transcendentals=L * B * sum(4 * dd[1] + T * dd[2] for dd in dims),
        ),
        **kwargs,
    )(*vmem_ins, *hbm_ins)
    return jnp.concatenate([jnp.zeros((B, 1), jnp.int32), tokens], axis=1)
