"""Fused LSTM cell as a Pallas TPU kernel.

One kernel computes ``gates = x @ Wx + h @ Wh + b`` on the MXU and applies the
sigmoid/tanh gate math on the VPU without materializing the [B, 4H] gate
tensor in HBM — the XLA fallback (mvc_tpu.models.rnn.lstm_step) emits two
matmuls plus separate elementwise ops.

Grid: (B / TB, H / TH).  Each program owns a [TB, TH] tile of the new h/c.
The 4 gate columns for a TH tile live at offsets {0, H, 2H, 3H} + th (torch
gate order i, f, g, o), so the kernel reads four [K, TH] weight stripes and
accumulates four [TB, TH] partial gates in VMEM scratch.

``use_pallas_lstm()`` gates dispatch: enabled on TPU backends via the
MVC_PALLAS env var (default on), interpret-mode on CPU for tests.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _lstm_kernel(x_ref, h_ref, wx_ref, wh_ref, b_ref, c_ref, h_out_ref, c_out_ref):
    """Refs:
      x:  [TB, K1]   inputs tile          wx: [K1, 4H] full input weights
      h:  [TB, H]    hidden tile          wh: [H, 4H]  full hidden weights
      b:  [1, 4H]    fused bias           c:  [TB, TH] cell tile
      out h/c: [TB, TH]
    The index_map hands each program the right TH column stripes.
    """
    x = x_ref[:]
    h = h_ref[:]
    gates = (
        jnp.dot(x, wx_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )                                            # [TB, 4*TH]
    th = gates.shape[1] // 4
    i = jax.nn.sigmoid(gates[:, 0 * th : 1 * th])
    f = jax.nn.sigmoid(gates[:, 1 * th : 2 * th])
    g = jnp.tanh(gates[:, 2 * th : 3 * th])
    o = jax.nn.sigmoid(gates[:, 3 * th : 4 * th])
    c_new = f * c_ref[:].astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c_new)
    h_out_ref[:] = h_new.astype(h_out_ref.dtype)
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "block_h", "interpret"))
def lstm_cell_pallas(
    params,
    x: jnp.ndarray,                    # [B, K]
    state: Tuple[jnp.ndarray, jnp.ndarray],
    block_b: int = 128,
    block_h: int = 128,
    interpret: bool = False,
):
    """Drop-in fused LSTM step.  Weights are the rnn.init_lstm layout
    ([K, 4H], [H, 4H], biases [4H])."""
    h, c = state
    B, K = x.shape
    H = h.shape[-1]
    dtype = x.dtype

    wx = params["wi"].astype(dtype)
    wh = params["wh"].astype(dtype)
    bias = (params["bi"] + params["bh"]).astype(jnp.float32).reshape(1, -1)

    # Tile sizes must divide the dims (the weight-regroup reshape assumes it);
    # fall back to whole-axis tiles otherwise.
    tb = block_b if B % block_b == 0 else B
    th = block_h if H % block_h == 0 else H
    grid = (_cdiv(B, tb), _cdiv(H, th))

    # Reorder weight columns so that each TH tile's 4 gate stripes are
    # contiguous: [K, 4H] -> [K, n_tiles, 4, th] -> [K, n_tiles*4*th].
    n_tiles = _cdiv(H, th)
    def regroup(w):
        w4 = w.reshape(w.shape[0], 4, n_tiles, th)
        return jnp.transpose(w4, (0, 2, 1, 3)).reshape(w.shape[0], 4 * H)

    wx_g = regroup(wx)
    wh_g = regroup(wh)
    b_g = regroup(bias)

    h_new, c_new = pl.pallas_call(
        _lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, K), lambda bi_, hi_: (bi_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, H), lambda bi_, hi_: (bi_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 4 * th), lambda bi_, hi_: (0, hi_), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * th), lambda bi_, hi_: (0, hi_), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * th), lambda bi_, hi_: (0, hi_), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, th), lambda bi_, hi_: (bi_, hi_), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, th), lambda bi_, hi_: (bi_, hi_), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, th), lambda bi_, hi_: (bi_, hi_), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (K + H) * 4 * H,
            bytes_accessed=(B * K + B * H * 3 + (K + H) * 4 * H) * x.dtype.itemsize,
            transcendentals=4 * B * H,
        ),
    )(x, h, wx_g, wh_g, b_g, c)
    return h_new, (h_new, c_new)
