"""The fused dual-decoder scan must be numerically identical to two
independent decodes (same rng split, same coins, same argmax feeds)."""

import numpy as np
import jax
import jax.numpy as jnp

from mvc_tpu.config import DecoderConfig, SOS_ID
from mvc_tpu.models.captioning import AVCaptioningDual

V_CFG = DecoderConfig(in_feature_size=18, rnn_hidden_size=16, embedding_size=8, attn_size=6)
A_CFG = DecoderConfig(in_feature_size=10, rnn_hidden_size=16, embedding_size=8, attn_size=6)
V = 23


def _models():
    kw = dict(vocab_size=V, teacher_forcing_ratio=0.7, reconstructor_type="global",
              visual_decoder_config=V_CFG, audio_decoder_config=A_CFG)
    return AVCaptioningDual(fused_scan=True, **kw), AVCaptioningDual(fused_scan=False, **kw)


def test_fused_forward_equals_separate(rng):
    fused, sep = _models()
    params = fused.init(jax.random.PRNGKey(0))
    B, T, L = 3, 4, 7
    audio = jnp.asarray(rng.normal(size=(B, T, 10)).astype(np.float32))
    visual = jnp.asarray(rng.normal(size=(B, T, 18)).astype(np.float32))
    captions = rng.integers(3, V, size=(L, B)).astype(np.int32)
    captions[0] = SOS_ID
    captions = jnp.asarray(captions)
    mask = jnp.asarray(np.ones((B, T), bool))

    key = jax.random.PRNGKey(7)
    out_f, ar_f, vr_f = fused.forward(params, audio, visual, captions, rng=key, feat_mask=mask)
    out_s, ar_s, vr_s = sep.forward(params, audio, visual, captions, rng=key, feat_mask=mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ar_f), np.asarray(ar_s), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vr_f), np.asarray(vr_s), rtol=1e-5, atol=1e-6)


def test_fused_predict_equals_separate(rng):
    fused, sep = _models()
    params = fused.init(jax.random.PRNGKey(1))
    B, T = 2, 5
    audio = jnp.asarray(rng.normal(size=(B, T, 10)).astype(np.float32))
    visual = jnp.asarray(rng.normal(size=(B, T, 18)).astype(np.float32))

    t_f = fused.predict_tokens(params, audio, visual, max_caption_len=8, mode="direct")
    t_s = sep.predict_tokens(params, audio, visual, max_caption_len=8, mode="direct")
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_s))
