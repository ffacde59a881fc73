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


def _import_reference_trainer():
    """Import the reference train.py module (its Trainer owns the .ckpt
    format, src/train.py:65-80).  get_loader runs spacy.load at import time
    and spacy is absent here — stub it (the Trainer never tokenizes)."""
    import importlib.util

    if "spacy" not in sys.modules:
        try:
            import spacy  # noqa: F401
        except ImportError:
            sp = types.ModuleType("spacy")
            sp.load = lambda name: types.SimpleNamespace(tokenizer=None)
            sys.modules["spacy"] = sp
    ref_root = os.path.dirname(REFERENCE_SRC)
    if ref_root not in sys.path:
        sys.path.insert(1, ref_root)  # vendored pycocoevalcap (losses import)
    spec = importlib.util.spec_from_file_location(
        "ref_train", os.path.join(REFERENCE_SRC, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_reference_trained_checkpoint_roundtrip(rng, tmp_path):
    """VERDICT r3 item 6: consume a reference-TRAINED artifact end to end.
    Trains the reference AVCaptioningDual for a few optimizer steps (the
    reference Trainer's step semantics, src/train.py:176-244), saves a .ckpt
    with the reference Trainer's OWN ``_save_checkpoint`` (src/train.py:65-80),
    converts it with utils/checkpoint_convert.convert_reference_checkpoint,
    and asserts our model reproduces the trained reference's teacher-forced
    forward, reconstructions, and greedy captions."""
    ref_train = _import_reference_trainer()  # also puts pycocoevalcap on path

    import models.captioning as ref_cap
    from losses import ModalityWiseReconstructionLossBuilder as RefBuilder

    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models.captioning import AVCaptioningDual, captions_from_tokens
    from mvc_tpu.utils.checkpoint_convert import convert_reference_checkpoint

    VV, A_DIM, V_DIM, HH = 40, 10, 18, 16

    class VocabShim:
        stoi = {"<PAD>": 0, "<SOS>": 1, "<EOS>": 2, "<UNK>": 3}
        itos = {v: k for k, v in stoi.items()}

        def __len__(self):
            return VV

        def decode_indexes(self, indexes):
            words = []
            for idx in indexes:
                idx = int(idx)
                if idx == 2:
                    break
                words.append(self.itos.get(idx, f"w{idx}"))
            return " ".join(words)

    small_v = dict(ref_cap.VISUAL_DECODER_CONFIG, in_feature_size=V_DIM,
                   rnn_hidden_size=HH, embedding_size=8, attn_size=6)
    small_a = dict(ref_cap.AUDIO_DECODER_CONFIG, in_feature_size=A_DIM,
                   rnn_hidden_size=HH, embedding_size=8, attn_size=6)
    old_v, old_a = ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG
    ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG = small_v, small_a
    try:
        torch.manual_seed(0)
        ref = ref_cap.AVCaptioningDual(
            vocab=VocabShim(), teacher_forcing_ratio=1.0,
            reconstructor_type="global", device="cpu",
        )
    finally:
        ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG = old_v, old_a

    # --- train the reference for real (its step semantics) -----------------
    B, T, L = 3, 4, 8
    loss_fn = RefBuilder(rec_type="global", reg_lambda=0.001,
                         audio_recon_lambda=10.0, visual_recon_lambda=10.0)
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3, weight_decay=1e-5, amsgrad=True)
    audio = torch.tensor(rng.normal(size=(B, T, A_DIM)).astype(np.float32))
    visual = torch.tensor(rng.normal(size=(B, T, V_DIM)).astype(np.float32))
    captions = torch.tensor(np.concatenate([
        np.full((1, B), SOS_ID, np.int64),
        rng.integers(3, VV, size=(L - 1, B), dtype=np.int64),
    ]))
    ref.train()
    for _ in range(4):
        opt.zero_grad()
        outputs, a_rec, v_rec = ref(audio, visual, captions)
        loss, *_ = loss_fn(outputs, captions, audio, a_rec, visual, v_rec)
        loss.mean().backward()
        torch.nn.utils.clip_grad_value_(ref.parameters(), clip_value=5.0)
        opt.step()
    ref.eval()

    # --- save with the reference Trainer's own _save_checkpoint ------------
    ckpt_path = str(tmp_path / "checkpoints" / "dual.ckpt")
    trainer = ref_train.Trainer(checkpoint_name=ckpt_path,
                                log_dir=str(tmp_path / "logs"))
    trainer.history = {"train_loss": [loss.mean().item()]}
    trainer._save_checkpoint(4, ref, None)
    assert os.path.isfile(ckpt_path)

    # --- convert and compare ------------------------------------------------
    ck = convert_reference_checkpoint(ckpt_path)
    assert ck["epoch"] == 4
    assert ck["history"]["train_loss"] == trainer.history["train_loss"]
    params = ck["params"]

    ours = AVCaptioningDual(
        vocab_size=VV, teacher_forcing_ratio=1.0, reconstructor_type="global",
        visual_decoder_config=DecoderConfig(
            in_feature_size=V_DIM, output_size=VV, rnn_hidden_size=HH,
            embedding_size=8, attn_size=6),
        audio_decoder_config=DecoderConfig(
            in_feature_size=A_DIM, output_size=VV, rnn_hidden_size=HH,
            embedding_size=8, attn_size=6),
    )

    with torch.no_grad():
        ref_out, ref_arec, ref_vrec = ref(audio, visual, captions)
    j_caps = jnp.asarray(captions.numpy().astype(np.int32))
    out, arec, vrec = ours.forward(
        params, jnp.asarray(audio.numpy()), jnp.asarray(visual.numpy()),
        j_caps, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(arec), ref_arec.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vrec), ref_vrec.numpy(), rtol=1e-4, atol=1e-4)

    # greedy captions through each framework's own predict + vocab decode
    with torch.no_grad():
        ref_caps = ref.predict(audio, visual, max_caption_len=L, mode="direct")
    tokens = ours.predict_tokens(
        params, jnp.asarray(audio.numpy()), jnp.asarray(visual.numpy()),
        max_caption_len=L, mode="direct",
    )
    assert captions_from_tokens(VocabShim(), tokens) == list(ref_caps)


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
