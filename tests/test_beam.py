"""Beam-search parity: the jitted tensorized beam must reproduce an in-test
list-based oracle implementing the reference algorithm (EOS-masked scores,
GNMT length normalization, flattened top-k with unnormalized cumulative
scores), stepping the same decoder weights."""

import numpy as np
import jax
import jax.numpy as jnp

from mvc_tpu.config import EOS_ID, SOS_ID, DecoderConfig
from mvc_tpu.models import attention as attn
from mvc_tpu.models import beam as beam_mod
from mvc_tpu.models import decoder as dec
from mvc_tpu.models.captioning import AVCaptioning, AVCaptioningDual

CFG = DecoderConfig(
    rnn_hidden_size=16, in_feature_size=12, embedding_size=8, attn_size=6, output_size=11
)


def _step_np(params, feats, prev, h, c):
    """Single-beam step through the production decoder_step."""
    keys = attn.precompute_keys(params["attention"], jnp.asarray(feats))
    logp, (h2, c2), _ = dec.decoder_step(
        params, CFG, jnp.asarray(prev), (jnp.asarray(h), jnp.asarray(c)),
        jnp.asarray(feats), keys, None,
    )
    return np.asarray(logp), np.asarray(h2), np.asarray(c2)


def oracle_beam(params, feats, max_len, alpha, width):
    """List-based transcription of the reference beam algorithm
    (src/models/features_captioning.py:131-228 semantics)."""
    B = feats.shape[0]
    H = CFG.rnn_hidden_size
    V = CFG.output_size
    inputs = [np.full((B,), SOS_ID, dtype=np.int32)]
    hiddens = [(np.zeros((B, H), np.float32), np.zeros((B, H), np.float32))]
    cums = [np.zeros((B,), np.float32)]
    hist = [[[] for _ in range(1)] for _ in range(B)]  # hist[b][i] token list

    for t in range(max_len + 1):
        outs, news, lens_l = [], [], []
        for i, (prev, (h, c), cum) in enumerate(zip(inputs, hiddens, cums)):
            logp, h2, c2 = _step_np(params, feats, prev, h, c)
            eos_mask = np.array(
                [0.0 if EOS_ID in hist[b][i] else 1.0 for b in range(B)], np.float32
            )
            out = eos_mask[:, None] * logp + cum[:, None]
            outs.append(out)
            news.append((h2, c2))
            lens = np.array(
                [hist[b][i].index(EOS_ID) + 1 if EOS_ID in hist[b][i] else t + 1 for b in range(B)],
                np.float32,
            )
            lens_l.append(lens)
        w_now = len(inputs)
        cat = np.concatenate(outs, axis=1)                      # [B, w_now*V]
        norm = np.concatenate(
            [(((5 + l) ** alpha) / (6 ** alpha))[:, None].repeat(V, 1) for l in lens_l], axis=1
        )
        order = np.argsort(-cat / norm, axis=1, kind="stable")[:, :width]
        bi, oi = order // V, order % V

        new_inputs = [np.zeros((B,), np.int32) for _ in range(width)]
        new_hiddens = [(np.zeros((B, H), np.float32), np.zeros((B, H), np.float32)) for _ in range(width)]
        new_cums = [np.zeros((B,), np.float32) for _ in range(width)]
        new_hist = [[None] * width for _ in range(B)]
        for b in range(B):
            for k in range(width):
                src, tok = int(bi[b, k]), int(oi[b, k])
                new_inputs[k][b] = tok
                new_hiddens[k][0][b] = news[src][0][b]
                new_hiddens[k][1][b] = news[src][1][b]
                new_cums[k][b] = cat[b, src * V + tok]
                new_hist[b][k] = hist[b][src] + [tok]
        inputs, hiddens, cums, hist = new_inputs, new_hiddens, new_cums, new_hist

    return np.array([[SOS_ID] + hist[b][0] for b in range(B)], np.int32)


def _run_ours(params, feats, max_len, alpha, width):
    model_feats = jnp.asarray(feats)
    keys = attn.precompute_keys(params["attention"], model_feats)
    B = feats.shape[0]

    def step_fn(prev, state):
        return dec.decoder_beam_step(params, CFG, prev, state, model_feats, keys, None)

    h = jnp.zeros((B, width, CFG.rnn_hidden_size))
    return np.asarray(
        beam_mod.beam_search(step_fn, (h, h), B, CFG.output_size, max_len, alpha, width)
    )


def test_beam_matches_oracle(rng):
    params = dec.init_decoder(jax.random.PRNGKey(11), CFG)
    feats = rng.normal(size=(3, 4, CFG.in_feature_size)).astype(np.float32)
    for alpha in (0.0, 0.9):
        ours = _run_ours(params, feats, max_len=8, alpha=alpha, width=3)
        expected = oracle_beam(params, feats, max_len=8, alpha=alpha, width=3)
        np.testing.assert_array_equal(ours, expected)


def test_beam_early_exit_matches_full_oracle(rng):
    """The while_loop's all-finished early exit (models/beam.py) must be
    output-identical to the full-length algorithm: with EOS-biased weights
    every beam finishes within a few steps, the loop stops after the final
    sorting step, and the remaining positions hold hist's fill value 0 —
    exactly what the oracle's full run produces."""
    params = dec.init_decoder(jax.random.PRNGKey(21), CFG)
    # Strong EOS bias: all beams finish by ~step 2 of 9.
    params["out"]["b"] = params["out"]["b"].at[EOS_ID].add(25.0)
    feats = rng.normal(size=(3, 4, CFG.in_feature_size)).astype(np.float32)
    for alpha in (0.0, 0.9):
        ours = _run_ours(params, feats, max_len=8, alpha=alpha, width=3)
        expected = oracle_beam(params, feats, max_len=8, alpha=alpha, width=3)
        np.testing.assert_array_equal(ours, expected)


def test_beam_width1_equals_greedy_prefix(rng):
    params = dec.init_decoder(jax.random.PRNGKey(12), CFG)
    feats = rng.normal(size=(2, 3, CFG.in_feature_size)).astype(np.float32)
    beam_tokens = _run_ours(params, feats, max_len=7, alpha=0.0, width=1)
    outputs, _ = dec.decode(params, CFG, jnp.asarray(feats), captions=None, max_caption_len=8)
    greedy = np.asarray(dec.greedy_tokens(outputs))
    # identical until (and including) the first EOS
    for b in range(2):
        for t in range(1, 8):
            assert beam_tokens[b, t] == greedy[b, t]
            if beam_tokens[b, t] == EOS_ID:
                break


def test_model_predict_modes(rng):
    model = AVCaptioning(vocab_size=13, reconstructor_type="none")
    params = model.init(jax.random.PRNGKey(0))
    audio = jnp.asarray(rng.normal(size=(2, 4, 128)).astype(np.float32))
    visual = jnp.asarray(rng.normal(size=(2, 4, 2048)).astype(np.float32))
    direct = model.predict_tokens(params, audio, visual, max_caption_len=6, mode="direct")
    assert direct.shape == (2, 6)
    beam = model.predict_tokens(params, audio, visual, max_caption_len=6, mode="beam", beam_width=3)
    assert beam.shape == (2, 8)
    assert np.all(np.asarray(beam)[:, 0] == SOS_ID)


def test_dual_model_forward_and_beam(rng):
    model = AVCaptioningDual(vocab_size=13, reconstructor_type="global", teacher_forcing_ratio=1.0)
    params = model.init(jax.random.PRNGKey(0))
    audio = jnp.asarray(rng.normal(size=(2, 4, 128)).astype(np.float32))
    visual = jnp.asarray(rng.normal(size=(2, 4, 2048)).astype(np.float32))
    captions = jnp.asarray(rng.integers(3, 13, size=(7, 2)).astype(np.int32))

    outputs, a_rec, v_rec = model.forward(params, audio, visual, captions, rng=jax.random.PRNGKey(1))
    assert outputs.shape == (7, 2, 13)
    assert a_rec.shape == (2, 7, 128)
    assert v_rec.shape == (2, 7, 2048)

    beam = model.predict_tokens(params, audio, visual, max_caption_len=5, mode="beam", beam_width=2)
    assert beam.shape == (2, 7)

    # beam path is jittable
    f = jax.jit(
        lambda p, a, v: model.predict_tokens(p, a, v, max_caption_len=5, mode="beam", beam_width=2)
    )
    np.testing.assert_array_equal(np.asarray(f(params, audio, visual)), np.asarray(beam))
