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
