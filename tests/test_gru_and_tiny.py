"""GRU decoder path (the reference's rnn_type='GRU' option) and the 'tiny'
split fixture (the reference's de-facto integration fixture, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from mvc_tpu.config import DecoderConfig, ReconstructorConfig, SOS_ID
from mvc_tpu.data import VideoCaptioningDataset
from mvc_tpu.models import decoder as dec
from mvc_tpu.models import reconstructor as rec

GRU_CFG = DecoderConfig(rnn_type="GRU", in_feature_size=14, rnn_hidden_size=12,
                        embedding_size=8, attn_size=6, output_size=21)


def test_gru_decode_and_beam(rng):
    params = dec.init_decoder(jax.random.PRNGKey(0), GRU_CFG)
    feats = jnp.asarray(rng.normal(size=(2, 4, 14)).astype(np.float32))
    captions = rng.integers(3, 21, size=(6, 2)).astype(np.int32)
    captions[0] = SOS_ID

    outputs, hiddens = dec.decode(
        params, GRU_CFG, feats, captions=jnp.asarray(captions),
        teacher_forcing_ratio=1.0, rng=jax.random.PRNGKey(1),
    )
    assert outputs.shape == (6, 2, 21)
    assert hiddens.shape == (6, 2, 12)
    np.testing.assert_allclose(np.exp(np.asarray(outputs[1:])).sum(-1), 1.0, rtol=1e-4)

    # greedy + teacher-forcing-off equivalence holds for GRU too
    out_tf0, _ = dec.decode(params, GRU_CFG, feats, captions=jnp.asarray(captions),
                            teacher_forcing_ratio=0.0)
    out_greedy, _ = dec.decode(params, GRU_CFG, feats, captions=None, max_caption_len=6)
    np.testing.assert_allclose(np.asarray(out_tf0), np.asarray(out_greedy), rtol=1e-6)

    # beam-batched step works with the single-leaf GRU state
    from mvc_tpu.models import attention as attn
    from mvc_tpu.models import beam as beam_mod

    keys = attn.precompute_keys(params["attention"], feats)

    def step_fn(prev, state):
        return dec.decoder_beam_step(params, GRU_CFG, prev, state, feats, keys, None)

    h0 = jnp.zeros((2, 3, 12))
    tokens = beam_mod.beam_search(step_fn, h0, 2, 21, max_caption_len=5, beam_width=3)
    assert tokens.shape == (2, 7)


def test_gru_reconstructors(rng):
    g_cfg = ReconstructorConfig(type="global", rnn_type="GRU", decoder_size=12, hidden_size=14)
    l_cfg = ReconstructorConfig(type="local", rnn_type="GRU", decoder_size=12, hidden_size=14, attn_size=6)
    hiddens = jnp.asarray(rng.normal(size=(6, 2, 12)).astype(np.float32))
    mask = jnp.asarray(np.ones((6, 2), bool))

    gp = rec.init_global_reconstructor(jax.random.PRNGKey(2), g_cfg)
    out_g = rec.global_reconstruct(gp, g_cfg, hiddens, mask)
    assert out_g.shape == (2, 6, 14)

    lp = rec.init_local_reconstructor(jax.random.PRNGKey(3), l_cfg)
    out_l = rec.local_reconstruct(lp, l_cfg, hiddens, mask, feat_len=4)
    assert out_l.shape == (2, 4, 14)
    assert np.all(np.isfinite(np.asarray(out_g))) and np.all(np.isfinite(np.asarray(out_l)))


def test_tiny_split(synthetic_msvd):
    ds = VideoCaptioningDataset(
        str(synthetic_msvd), split="tiny",
        vocab_path=str(synthetic_msvd / "metadata" / "vocab.json"), verbose=False,
    )
    assert 0 < len(ds) <= 6
    item = ds[0]
    assert item["caption"][0] == SOS_ID
