"""Fused single-step LSTM / GRU cells.

Gate layout follows torch's concatenated convention so converted reference
checkpoints map 1:1 (LSTM gates i,f,g,o; GRU gates r,z,n) — the reference uses
stock ``nn.LSTM``/``nn.GRU`` (src/models/features_captioning.py:47-54).

Each step is two MXU matmuls ([B,in]x[in,4H] and [B,H]x[H,4H]) plus VPU
elementwise gates; XLA fuses the latter into the matmul epilogue.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mvc_tpu.models.initializers import rnn_params
from mvc_tpu.ops.quant import wmat


def init_lstm(key, in_size: int, hidden_size: int, dtype=jnp.float32):
    return rnn_params(key, in_size, hidden_size, n_gates=4, dtype=dtype)


def init_gru(key, in_size: int, hidden_size: int, dtype=jnp.float32):
    return rnn_params(key, in_size, hidden_size, n_gates=3, dtype=dtype)


def lstm_step(params, x: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]):
    """x: [B, in], state: (h, c) each [B, H] -> (h', (h', c')).

    Weights are cast to the activation dtype so bf16 compute keeps a bf16
    carry (params stay f32 master copies)."""
    h, c = state
    d = x.dtype
    # wmat: plain astype, or fused int8 dequant for weight-only-quantized
    # decode (ops/quant.py — opt-in, inference only)
    gates = (
        x @ wmat(params["wi"], d) + h @ wmat(params["wh"], d)
        + (params["bi"] + params["bh"]).astype(d)
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


def gru_step(params, x: jnp.ndarray, state: jnp.ndarray):
    """x: [B, in], state: h [B, H] -> (h', h').

    torch GRU: n = tanh(W_in x + b_in + r * (W_hn h + b_hn)).
    """
    h = state
    d = x.dtype
    gi = x @ wmat(params["wi"], d) + params["bi"].astype(d)
    gh = h @ wmat(params["wh"], d) + params["bh"].astype(d)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    h_new = (1.0 - z) * n + z * h
    return h_new, h_new


def rnn_input_preact(params, rnn_type: str, x: jnp.ndarray) -> jnp.ndarray:
    """Input-side gate preactivation ``x @ wi + bi`` ([..., G*H]).

    It is linear in x, so when the whole input sequence is known before the
    scan (teacher forcing, reconstructor inputs) it can be computed for ALL
    timesteps in one batched GEMM — the scan then streams only the recurrent
    ``wh`` per step instead of re-reading ``wi`` every iteration (the
    cuDNN-style RNN input batching; BENCH_NOTES round 3)."""
    del rnn_type  # same input-side form for LSTM and GRU
    d = x.dtype
    return x @ wmat(params["wi"], d) + params["bi"].astype(d)


def lstm_step_pre(params, gi: jnp.ndarray, state):
    """LSTM step from a precomputed input preactivation gi = x @ wi + bi."""
    h, c = state
    d = gi.dtype
    gates = gi + h @ wmat(params["wh"], d) + params["bh"].astype(d)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


def gru_step_pre(params, gi: jnp.ndarray, state):
    """GRU step from a precomputed input preactivation gi = x @ wi + bi."""
    h = state
    d = gi.dtype
    gh = h @ wmat(params["wh"], d) + params["bh"].astype(d)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    h_new = (1.0 - z) * n + z * h
    return h_new, h_new


def rnn_step_pre(params, rnn_type: str, gi, state):
    if rnn_type == "LSTM":
        return lstm_step_pre(params, gi, state)
    return gru_step_pre(params, gi, state)


@jax.custom_vjp
def _lstm_scan_pre(wh, bh, gi_all, h0, c0):
    return _lstm_scan_pre_fwd(wh, bh, gi_all, h0, c0)[0]


def _lstm_scan_pre_fwd(wh, bh, gi_all, h0, c0):
    d = gi_all.dtype
    wh_d, bh_d = wmat(wh, d), bh.astype(d)

    def step(state, gi):
        h, c = state
        gates = gi + h @ wh_d + bh_d
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        si, sf = jax.nn.sigmoid(i), jax.nn.sigmoid(f)
        tg, so = jnp.tanh(g), jax.nn.sigmoid(o)
        c_new = sf * c + si * tg
        h_new = so * jnp.tanh(c_new)
        return (h_new, c_new), (h_new, (si, sf, tg, so, h, c, c_new))

    _, (hs, saved) = jax.lax.scan(step, (h0, c0), gi_all)
    return hs, (wh, bh, saved)


def _lstm_scan_pre_bwd(res, dhs):
    wh, bh, (si, sf, tg, so, h_prev, c_prev, c_new) = res
    d = si.dtype
    wh_t = wmat(wh, d).T

    def step(carry, xs):
        dh_rec, dc_rec = carry
        dh_out, si, sf, tg, so, c_prev, c_new = xs
        dh = dh_rec + dh_out.astype(d)
        tc = jnp.tanh(c_new)
        dc = dc_rec + dh * so * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc * tg * si * (1.0 - si),          # d i_pre
            dc * c_prev * sf * (1.0 - sf),      # d f_pre
            dc * si * (1.0 - tg * tg),          # d g_pre
            dh * tc * so * (1.0 - so),          # d o_pre
        ], axis=-1)
        return (dgates @ wh_t, dc * sf), dgates

    L, B, H = dhs.shape
    zero = jnp.zeros((B, H), d)
    (dh0, dc0), dgates = jax.lax.scan(
        step, (zero, zero), (dhs, si, sf, tg, so, c_prev, c_new), reverse=True)
    # THE point of this custom vjp: dwh as ONE stacked GEMM over all steps,
    # instead of lax.scan's per-step read-modify-write of a full-size f32
    # accumulator (8 x 134 MB of HBM traffic at the reference recon shape)
    GH = dgates.shape[-1]
    dwh = (h_prev.reshape(L * B, H).T @ dgates.reshape(L * B, GH)).astype(wh.dtype)
    dbh = jnp.sum(dgates, axis=(0, 1)).astype(bh.dtype)
    return dwh, dbh, dgates, dh0.astype(d), dc0.astype(d)


_lstm_scan_pre.defvjp(_lstm_scan_pre_fwd, _lstm_scan_pre_bwd)


@jax.custom_vjp
def _gru_scan_pre(wh, bh, gi_all, h0):
    return _gru_scan_pre_fwd(wh, bh, gi_all, h0)[0]


def _gru_scan_pre_fwd(wh, bh, gi_all, h0):
    d = gi_all.dtype
    wh_d, bh_d = wmat(wh, d), bh.astype(d)

    def step(h, gi):
        gh = h @ wh_d + bh_d
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, (h_new, (r, z, n, h, h_n))

    _, (hs, saved) = jax.lax.scan(step, h0, gi_all)
    return hs, (wh, bh, saved)


def _gru_scan_pre_bwd(res, dhs):
    wh, bh, (r, z, n, h_prev, h_n) = res
    d = r.dtype
    wh_t = wmat(wh, d).T

    def step(dh_rec, xs):
        dh_out, r, z, n, hp, h_n = xs
        dh = dh_rec + dh_out.astype(d)
        dz_pre = dh * (hp - n) * z * (1.0 - z)
        dn_pre = dh * (1.0 - z) * (1.0 - n * n)
        dr_pre = dn_pre * h_n * r * (1.0 - r)
        dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
        dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
        dh_prev = dgh @ wh_t + dh * z
        return dh_prev, (dgi, dgh)

    L, B, H = dhs.shape
    dh0, (dgi, dgh) = jax.lax.scan(
        step, jnp.zeros((B, H), d), (dhs, r, z, n, h_prev, h_n), reverse=True)
    GH = dgh.shape[-1]
    dwh = (h_prev.reshape(L * B, H).T @ dgh.reshape(L * B, GH)).astype(wh.dtype)
    dbh = jnp.sum(dgh, axis=(0, 1)).astype(bh.dtype)
    return dwh, dbh, dgi, dh0.astype(d)


_gru_scan_pre.defvjp(_gru_scan_pre_fwd, _gru_scan_pre_bwd)


def rnn_scan_pre(params, rnn_type: str, gi_all: jnp.ndarray, init_state):
    """Whole-sequence RNN from precomputed input preactivations: the hidden
    sequence of scanning ``rnn_step_pre`` over ``gi_all`` [L, B, G*H].

    Same forward math as the plain ``lax.scan``; the difference is the
    custom backward: lax.scan accumulates the recurrent weight gradient by
    reading+writing a full-size f32 ``dwh`` buffer EVERY step (at the
    reference's global-reconstructor shape, [2048, 8192] f32 = 67 MB x 8
    steps x r+w ~ 1.07 GB of HBM traffic — the single largest backward cost
    in the train step, BENCH_NOTES round 5).  Here the backward scan only
    carries [B, H] state and stacks the per-step gate cotangents, then forms
    ``dwh`` as ONE [H, L*B] x [L*B, G*H] GEMM.  Gradients match the scan
    path to float tolerance (summation order differs;
    tests/test_reconstructor.py pins it).

    Returns hiddens [L, B, H] in gi_all's dtype."""
    if rnn_type == "LSTM":
        h0, c0 = init_state
        return _lstm_scan_pre(params["wh"], params["bh"], gi_all, h0, c0)
    return _gru_scan_pre(params["wh"], params["bh"], gi_all, init_state)


def init_rnn(key, rnn_type: str, in_size: int, hidden_size: int, dtype=jnp.float32):
    if rnn_type == "LSTM":
        return init_lstm(key, in_size, hidden_size, dtype)
    if rnn_type == "GRU":
        return init_gru(key, in_size, hidden_size, dtype)
    raise ValueError(f"rnn_type must be LSTM or GRU, got {rnn_type}")


def rnn_step(params, rnn_type: str, x, state):
    if rnn_type == "LSTM":
        return lstm_step(params, x, state)
    return gru_step(params, x, state)


def init_state(rnn_type: str, batch_size: int, hidden_size: int, dtype=jnp.float32):
    h = jnp.zeros((batch_size, hidden_size), dtype)
    if rnn_type == "LSTM":
        return (h, h)
    return h


def state_hidden(rnn_type: str, state):
    """The h part of the state (what the reference exposes as 'hidden[0]')."""
    return state[0] if rnn_type == "LSTM" else state
