"""Parameter initializers matching torch layer defaults, so training dynamics
are comparable with the reference and converted checkpoints drop in cleanly.

- Linear: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias
- LSTM/GRU: U(-1/sqrt(hidden), 1/sqrt(hidden)) for all weights/biases
- Embedding: N(0, 1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_params(key, in_size: int, out_size: int, bias: bool = True, dtype=jnp.float32):
    """Weight stored as [in, out] (right-multiply: y = x @ w + b)."""
    bound = 1.0 / jnp.sqrt(in_size)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (in_size, out_size), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_size,), dtype, -bound, bound)
    return p


def embedding_params(key, vocab_size: int, embed_size: int, dtype=jnp.float32):
    return {"table": jax.random.normal(key, (vocab_size, embed_size), dtype)}


def rnn_params(key, in_size: int, hidden_size: int, n_gates: int, dtype=jnp.float32):
    """Input/hidden weights as [in, G*H] / [H, G*H] with separate input/hidden
    biases (torch RNN layout, gate-concatenated)."""
    bound = 1.0 / jnp.sqrt(hidden_size)
    k = jax.random.split(key, 4)
    g = n_gates * hidden_size
    return {
        "wi": jax.random.uniform(k[0], (in_size, g), dtype, -bound, bound),
        "wh": jax.random.uniform(k[1], (hidden_size, g), dtype, -bound, bound),
        "bi": jax.random.uniform(k[2], (g,), dtype, -bound, bound),
        "bh": jax.random.uniform(k[3], (g,), dtype, -bound, bound),
    }
