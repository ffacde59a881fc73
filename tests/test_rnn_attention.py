"""Golden parity of the fused RNN cells and temporal attention against
torch-composed oracles with transplanted weights."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from mvc_tpu.models import attention as attn
from mvc_tpu.models import rnn


def test_lstm_step_matches_torch(rng):
    B, IN, H = 4, 12, 16
    params = rnn.init_lstm(jax.random.PRNGKey(0), IN, H)
    cell = torch.nn.LSTMCell(IN, H)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.tensor(np.asarray(params["wi"]).T))
        cell.weight_hh.copy_(torch.tensor(np.asarray(params["wh"]).T))
        cell.bias_ih.copy_(torch.tensor(np.asarray(params["bi"])))
        cell.bias_hh.copy_(torch.tensor(np.asarray(params["bh"])))

    x = rng.normal(size=(B, IN)).astype(np.float32)
    h0 = rng.normal(size=(B, H)).astype(np.float32)
    c0 = rng.normal(size=(B, H)).astype(np.float32)

    out, (h1, c1) = rnn.lstm_step(params, jnp.asarray(x), (jnp.asarray(h0), jnp.asarray(c0)))
    with torch.no_grad():
        th, tc = cell(torch.tensor(x), (torch.tensor(h0), torch.tensor(c0)))
    np.testing.assert_allclose(np.asarray(h1), th.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), tc.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(h1))


def test_gru_step_matches_torch(rng):
    B, IN, H = 3, 10, 8
    params = rnn.init_gru(jax.random.PRNGKey(1), IN, H)
    cell = torch.nn.GRUCell(IN, H)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.tensor(np.asarray(params["wi"]).T))
        cell.weight_hh.copy_(torch.tensor(np.asarray(params["wh"]).T))
        cell.bias_ih.copy_(torch.tensor(np.asarray(params["bi"])))
        cell.bias_hh.copy_(torch.tensor(np.asarray(params["bh"])))

    x = rng.normal(size=(B, IN)).astype(np.float32)
    h0 = rng.normal(size=(B, H)).astype(np.float32)
    h1, _ = rnn.gru_step(params, jnp.asarray(x), jnp.asarray(h0))
    with torch.no_grad():
        th = cell(torch.tensor(x), torch.tensor(h0))
    np.testing.assert_allclose(np.asarray(h1), th.numpy(), rtol=1e-5, atol=1e-5)


def _np_attention(params, hidden, feats, mask=None):
    """Direct numpy transcription of the additive-attention math
    (w . tanh(W h + U v + b), masked softmax, weighted sum)."""
    W, U, b, w = (np.asarray(params[k]) for k in ("W", "U", "b", "w"))
    e = np.tanh(hidden @ W[None] + feats @ U + b) @ w       # [B, T]
    if mask is not None:
        e = np.where(mask, e, -np.inf)
    e = e - e.max(axis=1, keepdims=True)
    p = np.exp(e)
    p /= p.sum(axis=1, keepdims=True)
    ctx = (p[:, :, None] * feats).sum(axis=1)
    return ctx, p


def test_attention_matches_numpy(rng):
    B, T, H, F, A = 3, 7, 16, 20, 8
    params = attn.init_attention(jax.random.PRNGKey(2), H, F, A)
    hidden = rng.normal(size=(B, H)).astype(np.float32)
    feats = rng.normal(size=(B, T, F)).astype(np.float32)

    ctx, wts = attn.attend(params, jnp.asarray(hidden), jnp.asarray(feats))
    ectx, ewts = _np_attention(params, hidden[:, None], feats)
    np.testing.assert_allclose(np.asarray(wts), ewts, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx), ectx, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wts).sum(axis=1), 1.0, rtol=1e-5)


def test_attention_mask(rng):
    B, T, H, F, A = 2, 6, 8, 10, 4
    params = attn.init_attention(jax.random.PRNGKey(3), H, F, A)
    hidden = rng.normal(size=(B, H)).astype(np.float32)
    feats = rng.normal(size=(B, T, F)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]], dtype=bool)

    _, wts = attn.attend(params, jnp.asarray(hidden), jnp.asarray(feats), mask=jnp.asarray(mask))
    wts = np.asarray(wts)
    assert np.all(wts[~mask] == 0)
    np.testing.assert_allclose(wts.sum(axis=1), 1.0, rtol=1e-5)

    # masked attention over padded frames == unmasked attention on the
    # truncated sequence
    _, wts_trunc = attn.attend(params, jnp.asarray(hidden[:1]), jnp.asarray(feats[:1, :3]))
    np.testing.assert_allclose(wts[0, :3], np.asarray(wts_trunc)[0], rtol=1e-5, atol=1e-6)


def test_precomputed_keys_equivalent(rng):
    B, T, H, F, A = 2, 5, 8, 10, 4
    params = attn.init_attention(jax.random.PRNGKey(4), H, F, A)
    hidden = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    keys = attn.precompute_keys(params, feats)
    c1, w1 = attn.attend(params, hidden, feats)
    c2, w2 = attn.attend(params, hidden, feats, keys=keys)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6)


def test_rnn_step_pre_matches_rnn_step(rng):
    """rnn_step_pre(rnn_input_preact(x)) must equal rnn_step(x) for both
    cells — the hoisted-scan formulations (decoder._decode_tf_hoisted,
    reconstructor.global_reconstruct) rely on this split."""
    from mvc_tpu.models import rnn

    B, IN, H = 3, 10, 8
    x = jnp.asarray(rng.normal(size=(B, IN)).astype(np.float32))
    for rnn_type in ("LSTM", "GRU"):
        params = rnn.init_rnn(jax.random.PRNGKey(7), rnn_type, IN, H)
        state = rnn.init_state(rnn_type, B, H)
        if rnn_type == "LSTM":
            state = (jnp.asarray(rng.normal(size=(B, H)).astype(np.float32)),
                     jnp.asarray(rng.normal(size=(B, H)).astype(np.float32)))
        else:
            state = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
        h1, s1 = rnn.rnn_step(params, rnn_type, x, state)
        gi = rnn.rnn_input_preact(params, rnn_type, x)
        h2, s2 = rnn.rnn_step_pre(params, rnn_type, gi, state)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
