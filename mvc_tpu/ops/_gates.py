"""Shared RNN gate-update for the fused whole-decode Pallas kernels.

One [rows, TG] gate tile's elementwise math, identical across
ops/pallas_decode.py, ops/pallas_dual_greedy.py, and ops/pallas_beam.py —
factored out so a change to gate semantics can't silently land in only one
kernel.  Torch gate order: LSTM i,f,g,o; GRU r,z,n with the recurrent
n-bias kept inside the reset product (torch nn.GRU semantics — see
models/rnn.py gru_step, the XLA oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_gate_tile(cell, gate_id, k, gv, gh, i_parts, g_parts, c_parts,
                    h_parts, h_f32, TG):
    """Consume one gate tile, mutating the per-gate part lists.

    LSTM: ``gv`` is the COMPLETE preactivation for this tile (``gh`` unused
    — the beam kernel fuses the recurrent term into its streamed matmul,
    the greedy kernels pass x-side + h-side + bias summed).
    GRU:  ``gv`` = x-side + bi, ``gh`` = h-side + bh for this tile.
    ``h_f32``: previous hidden state (f32) for the GRU z-interpolation.
    """
    if cell == "LSTM":
        if gate_id == 0:
            i_parts[k] = jax.nn.sigmoid(gv)
        elif gate_id == 1:
            c_parts[k] = jax.nn.sigmoid(gv) * c_parts[k]
        elif gate_id == 2:
            g_parts[k] = jnp.tanh(gv)
        else:
            c_parts[k] = c_parts[k] + i_parts[k] * g_parts[k]
            h_parts[k] = jax.nn.sigmoid(gv) * jnp.tanh(c_parts[k])
    else:
        if gate_id == 0:
            i_parts[k] = jax.nn.sigmoid(gv + gh)                 # r
        elif gate_id == 1:
            g_parts[k] = jax.nn.sigmoid(gv + gh)                 # z
        else:
            z = g_parts[k]
            n = jnp.tanh(gv + i_parts[k] * gh)
            h_parts[k] = (1.0 - z) * n + z * h_f32[:, k * TG:(k + 1) * TG]
