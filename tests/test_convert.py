"""The strongest parity test: convert weights from the actual reference
model (imported read-only from /root/reference) and check our decoder
reproduces its teacher-forced outputs, greedy decode, and reconstructors
numerically."""

import os
import sys
import types

import numpy as np
import pytest
import torch

REFERENCE_SRC = "/root/reference/src"
HAS_REFERENCE = os.path.isdir(REFERENCE_SRC)

if HAS_REFERENCE:
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    # the reference models package imports torchvision (absent here); stub it
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.models = types.ModuleType("torchvision.models")
            tv.transforms = types.ModuleType("torchvision.transforms")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv.models
            sys.modules["torchvision.transforms"] = tv.transforms

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference unavailable")

import jax
import jax.numpy as jnp

from mvc_tpu.config import DecoderConfig, ReconstructorConfig, SOS_ID
from mvc_tpu.models import decoder as dec
from mvc_tpu.models import reconstructor as rec
from mvc_tpu.utils.checkpoint_convert import (
    convert_decoder_state_dict,
    convert_reconstructor_state_dict,
)

H, F, E, A, V = 32, 20, 12, 8, 40


def _ref_decoder():
    from models.features_captioning import FeaturesCaptioning

    torch.manual_seed(0)
    return FeaturesCaptioning(
        in_feature_size=F, output_size=V, rnn_type="LSTM", rnn_num_layers=1,
        rnn_bidirectional=False, rnn_hidden_size=H, rnn_dropout=0.0,
        embedding_size=E, attn_size=A, device="cpu",
    ).eval()


CFG = DecoderConfig(in_feature_size=F, output_size=V, rnn_hidden_size=H,
                    embedding_size=E, attn_size=A)


def test_converted_decoder_matches_reference_teacher_forced(rng):
    ref = _ref_decoder()
    params = convert_decoder_state_dict(ref.state_dict())

    B, T, L = 3, 5, 8
    feats = rng.normal(size=(B, T, F)).astype(np.float32)
    captions = rng.integers(3, V, size=(L, B)).astype(np.int64)
    captions[0] = SOS_ID

    with torch.no_grad():
        ref_out, ref_hid = ref.decode(
            torch.tensor(feats), torch.tensor(captions),
            max_caption_len=L, teacher_forcing_ratio=1,
        )
    ours_out, ours_hid = dec.decode(
        params, CFG, jnp.asarray(feats), captions=jnp.asarray(captions.astype(np.int32)),
        teacher_forcing_ratio=1.0, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(ours_out), ref_out.numpy(), rtol=1e-4, atol=1e-5)
    # reference hiddens are [L, D=1, B, H]
    np.testing.assert_allclose(
        np.asarray(ours_hid), ref_hid.numpy()[:, 0], rtol=1e-4, atol=1e-5
    )


def test_converted_decoder_matches_reference_greedy(rng):
    ref = _ref_decoder()
    params = convert_decoder_state_dict(ref.state_dict())
    B, T, L = 2, 4, 9
    feats = rng.normal(size=(B, T, F)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref.decode(torch.tensor(feats), None, max_caption_len=L)
    ours_out, _ = dec.decode(params, CFG, jnp.asarray(feats), captions=None, max_caption_len=L)
    # identical greedy token trajectories
    np.testing.assert_array_equal(
        np.asarray(ours_out).argmax(2), ref_out.numpy().argmax(2)
    )
    np.testing.assert_allclose(np.asarray(ours_out), ref_out.numpy(), rtol=1e-4, atol=1e-5)


def test_converted_reconstructors_match_reference(rng):
    from models.reconstructor import GlobalReconstructor, LocalReconstructor

    L, B, T = 7, 3, 4
    torch.manual_seed(1)
    g_ref = GlobalReconstructor(
        decoder_size=H, hidden_size=F, rnn_type="LSTM", rnn_num_layers=1,
        rnn_bidirectional=False, rnn_dropout=0.0, device="cpu",
    ).eval()
    l_ref = LocalReconstructor(
        decoder_size=H, hidden_size=F, rnn_type="LSTM", rnn_num_layers=1,
        rnn_bidirectional=False, rnn_dropout=0.0, attn_size=A, device="cpu",
    ).eval()

    g_params = convert_reconstructor_state_dict(g_ref.state_dict())
    l_params = convert_reconstructor_state_dict(l_ref.state_dict())
    g_cfg = ReconstructorConfig(type="global", decoder_size=H, hidden_size=F)
    l_cfg = ReconstructorConfig(type="local", decoder_size=H, hidden_size=F, attn_size=A)

    hiddens = rng.normal(size=(L, B, H)).astype(np.float32)
    captions = rng.integers(3, V, size=(L, B)).astype(np.int64)
    captions[0] = SOS_ID
    outputs = rng.normal(size=(L, B, V)).astype(np.float32)

    with torch.no_grad():
        # reference hiddens are [L, D, B, H]
        t_hid = torch.tensor(hiddens).unsqueeze(1)
        g_expected = g_ref.reconstruct(t_hid, torch.tensor(outputs), torch.tensor(captions), T)
        l_expected = l_ref.reconstruct(t_hid, torch.tensor(outputs), torch.tensor(captions), T)

    mask = rec.build_caption_mask(jnp.asarray(outputs), jnp.asarray(captions.astype(np.int32)))
    g_ours = rec.global_reconstruct(g_params, g_cfg, jnp.asarray(hiddens), mask)
    l_ours = rec.local_reconstruct(l_params, l_cfg, jnp.asarray(hiddens), mask, feat_len=T)
    np.testing.assert_allclose(np.asarray(g_ours), g_expected.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_ours), l_expected.numpy(), rtol=1e-4, atol=1e-5)


def test_converted_beam_matches_reference(rng):
    """Full beam-search parity: reference beam_search_predict vs our jitted
    beam with converted weights."""
    from mvc_tpu.models import attention as attn
    from mvc_tpu.models import beam as beam_mod

    ref = _ref_decoder()
    params = convert_decoder_state_dict(ref.state_dict())

    class VocabShim:
        stoi = {"<SOS>": 1, "<EOS>": 2}

        def __len__(self):
            return V

    B, T, L, W = 3, 4, 7, 3
    feats = rng.normal(size=(B, T, F)).astype(np.float32)
    with torch.no_grad():
        ref_tokens = ref.beam_search_predict(torch.tensor(feats), VocabShim(), L, 0, W)
    ref_tokens = np.array([[int(t) for t in row] for row in ref_tokens])

    jfeats = jnp.asarray(feats)
    keys = attn.precompute_keys(params["attention"], jfeats)

    def step_fn(prev, state):
        return dec.decoder_beam_step(params, CFG, prev, state, jfeats, keys, None)

    h = jnp.zeros((B, W, H))
    ours = np.asarray(
        beam_mod.beam_search(step_fn, (h, h), B, V, max_caption_len=L, beam_alpha=0.0, beam_width=W)
    )
    np.testing.assert_array_equal(ours, ref_tokens)
