"""Reconstructor parity vs torch-composed oracles (LSTMCell loops with
transplanted weights), mirroring the reference's reconstruct_sequence
semantics (global: t=1..L-1 with masked mean-pool input; local: T steps of
caption-masked attention over decoder hiddens)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from mvc_tpu.config import EOS_ID, PAD_ID, ReconstructorConfig
from mvc_tpu.models import reconstructor as rec

L, B, H, F, T, A = 7, 3, 10, 6, 5, 4

G_CFG = ReconstructorConfig(type="global", decoder_size=H, hidden_size=F)
L_CFG = ReconstructorConfig(type="local", decoder_size=H, hidden_size=F, attn_size=A)


def _lstm_cell_from(params, in_size, hidden):
    cell = torch.nn.LSTMCell(in_size, hidden)
    p = lambda a: torch.tensor(np.asarray(a))
    cell.weight_ih.data = p(params["wi"]).T.contiguous()
    cell.weight_hh.data = p(params["wh"]).T.contiguous()
    cell.bias_ih.data = p(params["bi"])
    cell.bias_hh.data = p(params["bh"])
    return cell


def _caption_mask(rng):
    captions = rng.integers(3, 20, size=(L, B))
    captions[0] = 1
    captions[-1] = EOS_ID
    captions[-2, 0] = PAD_ID
    return (captions != PAD_ID) & (captions != EOS_ID), captions


def test_global_reconstructor_matches_torch(rng):
    params = rec.init_global_reconstructor(jax.random.PRNGKey(8), G_CFG)
    hiddens = rng.normal(size=(L, B, H)).astype(np.float32)
    mask, _ = _caption_mask(rng)

    ours = np.asarray(
        rec.global_reconstruct(params, G_CFG, jnp.asarray(hiddens), jnp.asarray(mask))
    )

    with torch.no_grad():
        cell = _lstm_cell_from(params["rnn"], 2 * H, F)
        th = torch.tensor(hiddens)
        tm = torch.tensor(mask.astype(np.float32)).unsqueeze(2)
        lens = torch.tensor(mask.sum(axis=0).astype(np.float32)).unsqueeze(1)
        pooled = (th * tm).sum(dim=0) / lens
        h = torch.zeros(B, F); c = torch.zeros(B, F)
        out = [torch.zeros(B, F)]
        for t in range(1, L):
            h, c = cell(torch.cat([th[t], pooled], dim=1), (h, c))
            out.append(h)
        expected = torch.stack(out).transpose(0, 1).numpy()

    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)
    assert np.all(ours[:, 0, :] == 0)  # recons[0] stays zero


def test_local_reconstructor_matches_torch(rng):
    params = rec.init_local_reconstructor(jax.random.PRNGKey(9), L_CFG)
    hiddens = rng.normal(size=(L, B, H)).astype(np.float32)
    mask, _ = _caption_mask(rng)

    ours = np.asarray(
        rec.local_reconstruct(params, L_CFG, jnp.asarray(hiddens), jnp.asarray(mask), feat_len=T)
    )

    with torch.no_grad():
        cell = _lstm_cell_from(params["rnn"], H, F)
        ap = params["attention"]
        p = lambda a: torch.tensor(np.asarray(a))
        W, U, bb, w = p(ap["W"]), p(ap["U"]), p(ap["b"]), p(ap["w"])
        seq = torch.tensor(hiddens).permute(1, 0, 2)          # [B, L, H]
        attn_mask = torch.tensor(mask.T)                      # [B, L]
        h = torch.zeros(B, F); c = torch.zeros(B, F)
        out = []
        for _ in range(T):
            e = torch.tanh((h @ W).unsqueeze(1) + seq @ U + bb) @ w
            e = e.masked_fill(~attn_mask, -float("inf"))
            a = torch.softmax(e, dim=1)
            ctx = (a.unsqueeze(2) * seq).sum(dim=1)
            h, c = cell(ctx, (h, c))
            out.append(h)
        expected = torch.stack(out).transpose(0, 1).numpy()

    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_build_caption_mask(rng):
    mask, captions = _caption_mask(rng)
    ours = np.asarray(rec.build_caption_mask(None, jnp.asarray(captions)))
    np.testing.assert_array_equal(ours, mask)

    # falls back to argmax of outputs when captions are None
    outputs = rng.normal(size=(L, B, 20)).astype(np.float32)
    ours2 = np.asarray(rec.build_caption_mask(jnp.asarray(outputs), None))
    am = outputs.argmax(axis=2)
    np.testing.assert_array_equal(ours2, (am != PAD_ID) & (am != EOS_ID))


def test_reconstruct_dispatch(rng):
    hiddens = jnp.asarray(rng.normal(size=(L, B, H)).astype(np.float32))
    outputs = jnp.asarray(rng.normal(size=(L, B, 20)).astype(np.float32))
    mask, captions = _caption_mask(rng)

    assert rec.reconstruct(None, G_CFG, hiddens, outputs, jnp.asarray(captions), T) is None

    pg = rec.init_global_reconstructor(jax.random.PRNGKey(1), G_CFG)
    rg = rec.reconstruct(pg, G_CFG, hiddens, outputs, jnp.asarray(captions), T)
    assert rg.shape == (B, L, F)

    pl = rec.init_local_reconstructor(jax.random.PRNGKey(2), L_CFG)
    rl = rec.reconstruct(pl, L_CFG, hiddens, outputs, jnp.asarray(captions), T)
    assert rl.shape == (B, T, F)


def test_rnn_scan_pre_custom_vjp_matches_lax_scan():
    """rnn.rnn_scan_pre (custom-vjp backward: dwh as one stacked GEMM) must
    match the plain lax.scan of rnn_step_pre — bitwise forward, float-
    tolerance gradients — for both cells and compute dtypes."""
    import numpy as np

    from mvc_tpu.models import rnn

    rg = np.random.default_rng(0)
    L, B, H = 6, 8, 32
    for cell, G in (("LSTM", 4), ("GRU", 3)):
        for d, gtol in ((jnp.float32, 1e-5), (jnp.bfloat16, 6e-2)):
            params = jax.tree.map(
                lambda x: x.astype(d),
                rnn.init_rnn(jax.random.PRNGKey(0), cell, in_size=16, hidden_size=H))
            gi = jnp.asarray(rg.normal(size=(L, B, G * H)).astype(np.float32)).astype(d)
            init = rnn.init_state(cell, B, H, d)

            def plain(wh, bh, gi):
                p2 = {**params, "wh": wh, "bh": bh}

                def step(state, gi_t):
                    _, ns = rnn.rnn_step_pre(p2, cell, gi_t, state)
                    return ns, rnn.state_hidden(cell, ns)

                _, hs = jax.lax.scan(step, init, gi)
                return hs

            def fused(wh, bh, gi):
                return rnn.rnn_scan_pre({**params, "wh": wh, "bh": bh}, cell, gi, init)

            wh, bh = params["wh"], params["bh"]
            np.testing.assert_array_equal(np.asarray(plain(wh, bh, gi)),
                                          np.asarray(fused(wh, bh, gi)))
            ga = jax.grad(lambda *a: (plain(*a).astype(jnp.float32) ** 2).sum(),
                          argnums=(0, 1, 2))(wh, bh, gi)
            gb = jax.grad(lambda *a: (fused(*a).astype(jnp.float32) ** 2).sum(),
                          argnums=(0, 1, 2))(wh, bh, gi)
            for x, y in zip(ga, gb):
                np.testing.assert_allclose(
                    np.asarray(x, np.float32), np.asarray(y, np.float32),
                    rtol=gtol, atol=gtol, err_msg=f"{cell} {d}")
