"""Decoder parity: the lax.scan sentence decode must equal a step-by-step
torch-composed oracle (Embedding + additive attention + LSTMCell + Linear +
log_softmax) with transplanted weights."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from mvc_tpu.config import SOS_ID, DecoderConfig
from mvc_tpu.models import decoder as dec

CFG = DecoderConfig(
    rnn_hidden_size=24, in_feature_size=20, embedding_size=12, attn_size=8, output_size=30
)


class TorchDecoderOracle(torch.nn.Module):
    """Independent torch composition of the same architecture."""

    def __init__(self, params, cfg):
        super().__init__()
        p = lambda a: torch.tensor(np.asarray(a))
        self.embedding = torch.nn.Embedding(cfg.output_size, cfg.embedding_size)
        self.embedding.weight.data = p(params["embedding"]["table"])
        ap = params["attention"]
        self.W, self.U, self.b, self.w = p(ap["W"]), p(ap["U"]), p(ap["b"]), p(ap["w"])
        self.cell = torch.nn.LSTMCell(cfg.embedding_size + cfg.in_feature_size, cfg.rnn_hidden_size)
        rp = params["rnn"]
        self.cell.weight_ih.data = p(rp["wi"]).T.contiguous()
        self.cell.weight_hh.data = p(rp["wh"]).T.contiguous()
        self.cell.bias_ih.data = p(rp["bi"])
        self.cell.bias_hh.data = p(rp["bh"])
        self.out_w, self.out_b = p(params["out"]["w"]), p(params["out"]["b"])

    def step(self, prev, h, c, feats):
        emb = self.embedding(prev)
        e = torch.tanh((h @ self.W).unsqueeze(1) + feats @ self.U + self.b) @ self.w
        a = torch.softmax(e, dim=1)
        ctx = (a.unsqueeze(2) * feats).sum(dim=1)
        h, c = self.cell(torch.cat([emb, ctx], dim=1), (h, c))
        logits = h @ self.out_w + self.out_b
        return tF.log_softmax(logits, dim=1), h, c

    def decode_teacher_forced(self, feats, captions):
        L, B = captions.shape
        h = torch.zeros(B, self.cell.hidden_size)
        c = torch.zeros(B, self.cell.hidden_size)
        outs = [torch.zeros(B, self.out_b.shape[0])]
        hids = [torch.zeros(B, self.cell.hidden_size)]
        prev = torch.full((B,), SOS_ID, dtype=torch.long)
        for t in range(1, L):
            logp, h, c = self.step(prev, h, c, feats)
            outs.append(logp)
            hids.append(h)
            prev = captions[t]
        return torch.stack(outs), torch.stack(hids)

    def decode_greedy(self, feats, max_len):
        B = feats.shape[0]
        h = torch.zeros(B, self.cell.hidden_size)
        c = torch.zeros(B, self.cell.hidden_size)
        outs = [torch.zeros(B, self.out_b.shape[0])]
        prev = torch.full((B,), SOS_ID, dtype=torch.long)
        for t in range(1, max_len):
            logp, h, c = self.step(prev, h, c, feats)
            outs.append(logp)
            prev = logp.argmax(dim=1)
        return torch.stack(outs)


def _setup(rng, B=3, T=5, L=7):
    params = dec.init_decoder(jax.random.PRNGKey(5), CFG)
    feats = rng.normal(size=(B, T, CFG.in_feature_size)).astype(np.float32)
    captions = rng.integers(3, CFG.output_size, size=(L, B)).astype(np.int32)
    captions[0] = SOS_ID
    return params, feats, captions


def test_teacher_forced_decode_matches_torch(rng):
    params, feats, captions = _setup(rng)
    outputs, hiddens = dec.decode(
        params, CFG, jnp.asarray(feats), captions=jnp.asarray(captions),
        teacher_forcing_ratio=1.0, rng=jax.random.PRNGKey(0),
    )
    oracle = TorchDecoderOracle(params, CFG)
    with torch.no_grad():
        t_out, t_hid = oracle.decode_teacher_forced(
            torch.tensor(feats), torch.tensor(captions.astype(np.int64))
        )
    np.testing.assert_allclose(np.asarray(outputs), t_out.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hiddens), t_hid.numpy(), rtol=1e-4, atol=1e-5)
    # contract: row 0 is zeros
    assert np.all(np.asarray(outputs)[0] == 0)
    assert np.all(np.asarray(hiddens)[0] == 0)


def test_greedy_decode_matches_torch(rng):
    params, feats, _ = _setup(rng)
    outputs, _ = dec.decode(params, CFG, jnp.asarray(feats), captions=None, max_caption_len=9)
    oracle = TorchDecoderOracle(params, CFG)
    with torch.no_grad():
        t_out = oracle.decode_greedy(torch.tensor(feats), 9)
    np.testing.assert_allclose(np.asarray(outputs), t_out.numpy(), rtol=1e-4, atol=1e-5)
    tokens = dec.greedy_tokens(outputs)
    np.testing.assert_array_equal(
        np.asarray(tokens)[:, 1:], t_out.numpy().argmax(axis=2).T[:, 1:]
    )


def test_teacher_forcing_zero_equals_greedy(rng):
    params, feats, captions = _setup(rng)
    out_tf0, _ = dec.decode(
        params, CFG, jnp.asarray(feats), captions=jnp.asarray(captions),
        teacher_forcing_ratio=0.0, rng=jax.random.PRNGKey(0),
    )
    out_greedy, _ = dec.decode(
        params, CFG, jnp.asarray(feats), captions=None, max_caption_len=captions.shape[0]
    )
    np.testing.assert_allclose(np.asarray(out_tf0), np.asarray(out_greedy), rtol=1e-6)


def test_decode_is_jittable(rng):
    params, feats, captions = _setup(rng)
    f = jax.jit(
        lambda p, x, c, r: dec.decode(p, CFG, x, captions=c, teacher_forcing_ratio=0.5, rng=r)
    )
    out, hid = f(params, jnp.asarray(feats), jnp.asarray(captions), jax.random.PRNGKey(7))
    assert out.shape == (7, 3, CFG.output_size)
    assert hid.shape == (7, 3, CFG.rnn_hidden_size)
    # log-probs normalize
    np.testing.assert_allclose(
        np.exp(np.asarray(out[1:])).sum(axis=-1), 1.0, rtol=1e-4
    )


def test_feat_mask_equals_truncation(rng):
    """Masked attention over zero-padded frames == decoding the unpadded
    sequence (the static-shape guarantee)."""
    params, feats, captions = _setup(rng, B=2, T=5, L=6)
    T_real = 3
    feats_padded = feats.copy()
    feats_padded[:, T_real:] = 0.0
    mask = np.zeros((2, 5), dtype=bool)
    mask[:, :T_real] = True

    out_masked, _ = dec.decode(
        params, CFG, jnp.asarray(feats_padded), captions=jnp.asarray(captions),
        teacher_forcing_ratio=1.0, rng=jax.random.PRNGKey(0), feat_mask=jnp.asarray(mask),
    )
    out_trunc, _ = dec.decode(
        params, CFG, jnp.asarray(feats[:, :T_real]), captions=jnp.asarray(captions),
        teacher_forcing_ratio=1.0, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc), rtol=1e-4, atol=1e-5)


def test_decode_greedy_tokens_matches_stacked(rng):
    """Tokens-only greedy scan == argmax over the stacked [L,B,V] decode,
    bitwise (same per-step math; only the stacking is elided)."""
    params, feats, _ = _setup(rng, B=3, T=5, L=8)
    mask = np.ones((3, 5), dtype=bool)
    mask[1, 3:] = False
    for m in (None, jnp.asarray(mask)):
        outputs, _ = dec.decode(
            params, CFG, jnp.asarray(feats), captions=None,
            max_caption_len=8, feat_mask=m,
        )
        ref = np.asarray(dec.greedy_tokens(outputs))
        got = np.asarray(dec.decode_greedy_tokens(
            params, CFG, jnp.asarray(feats), max_caption_len=8, feat_mask=m,
        ))
        np.testing.assert_array_equal(got, ref)


def test_dual_greedy_tokens_fused_matches_stacked(rng):
    """Dual tokens-only scan == greedy_tokens(a_outputs + v_outputs) over
    the stacked fused decode (reference dual direct semantics)."""
    from mvc_tpu.models.captioning import dual_decode_fused, dual_greedy_tokens_fused

    a_cfg = CFG.replace(in_feature_size=12)
    v_params = dec.init_decoder(jax.random.PRNGKey(11), CFG)
    a_params = dec.init_decoder(jax.random.PRNGKey(12), a_cfg)
    visual = jnp.asarray(rng.normal(size=(3, 5, CFG.in_feature_size)).astype(np.float32))
    audio = jnp.asarray(rng.normal(size=(3, 5, 12)).astype(np.float32))

    v_out, _, a_out, _ = dual_decode_fused(
        v_params, a_params, CFG, a_cfg, visual, audio, captions=None,
        teacher_forcing_ratio=0.0, rng=None, feat_mask=None, max_caption_len=8,
    )
    ref = np.asarray(dec.greedy_tokens(a_out + v_out))
    got = np.asarray(dual_greedy_tokens_fused(
        v_params, a_params, CFG, a_cfg, visual, audio, max_caption_len=8,
        feat_mask=None,
    ))
    np.testing.assert_array_equal(got, ref)


def test_greedy_stop_at_all_eos_text_identical(rng):
    """stop_at_all_eos halts the decode loop once every row has emitted EOS;
    tokens up to and including each row's first EOS must match the full
    free-running decode exactly (later positions are 0 — never read by
    decode_indexes, so caption text is identical; PARITY.md)."""
    import jax.numpy as jnp

    from mvc_tpu.config import EOS_ID, DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.models.captioning import AVCaptioningDual, dual_greedy_tokens_fused

    cfg = DecoderConfig(rnn_hidden_size=16, in_feature_size=12,
                        embedding_size=8, attn_size=6, output_size=11)
    params = dec.init_decoder(jax.random.PRNGKey(31), cfg)
    params["out"]["b"] = params["out"]["b"].at[EOS_ID].add(8.0)  # EOS-y
    feats = jnp.asarray(rng.normal(size=(3, 4, 12)).astype(np.float32))

    full = np.asarray(dec.decode_greedy_tokens(params, cfg, feats, max_caption_len=9))
    fast = np.asarray(dec.decode_greedy_tokens(params, cfg, feats, max_caption_len=9,
                                               stop_at_all_eos=True))
    for b in range(full.shape[0]):
        eos_pos = np.where(full[b] == EOS_ID)[0]
        upto = (eos_pos[0] + 1) if len(eos_pos) else full.shape[1]
        np.testing.assert_array_equal(fast[b, :upto], full[b, :upto])
        assert np.all(fast[b, upto:] == 0) or upto == full.shape[1]

    # dual fused variant: same contract on the fused output stream
    model = AVCaptioningDual(vocab_size=11, reconstructor_type="none")
    p2 = model.init(jax.random.PRNGKey(5))
    for d in ("v_decoder", "a_decoder"):
        p2[d]["out"]["b"] = p2[d]["out"]["b"].at[EOS_ID].add(8.0)
    audio = jnp.asarray(rng.normal(size=(2, 4, 128)).astype(np.float32))
    visual = jnp.asarray(rng.normal(size=(2, 4, 2048)).astype(np.float32))
    full = np.asarray(model.predict_tokens(p2, audio, visual, max_caption_len=9))
    fast = np.asarray(model.predict_tokens(p2, audio, visual, max_caption_len=9,
                                           stop_at_all_eos=True))
    for b in range(full.shape[0]):
        eos_pos = np.where(full[b] == EOS_ID)[0]
        upto = (eos_pos[0] + 1) if len(eos_pos) else full.shape[1]
        np.testing.assert_array_equal(fast[b, :upto], full[b, :upto])
