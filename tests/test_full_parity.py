"""Capstone parity: the COMPLETE dual model + modality-wise loss pipeline vs
the reference implementation (imported read-only), with weights converted from
the reference's modules.  Covers concat/logit fusion, reconstructors, and all
loss components in one shot."""

import os
import sys
import types

import numpy as np
import pytest
import torch

REFERENCE_SRC = "/root/reference/src"
REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(REFERENCE_SRC)

if HAS_REFERENCE:
    for p in (REFERENCE_SRC, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
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

from mvc_tpu.config import SOS_ID, DecoderConfig, ReconstructorConfig
from mvc_tpu.models.captioning import AVCaptioningDual
from mvc_tpu.training import losses as our_losses
from mvc_tpu.utils.checkpoint_convert import (
    convert_decoder_state_dict,
    convert_reconstructor_state_dict,
)

V = 31


class _Vocab:
    def __len__(self):
        return V


def _make_pair(rec_type):
    """(reference AVCaptioningDual, our model, converted params) with small
    dims injected through the reference's module-level configs."""
    import models.captioning as ref_cap

    small_v = dict(ref_cap.VISUAL_DECODER_CONFIG, in_feature_size=18,
                   rnn_hidden_size=16, embedding_size=8, attn_size=6)
    small_a = dict(ref_cap.AUDIO_DECODER_CONFIG, in_feature_size=10,
                   rnn_hidden_size=16, embedding_size=8, attn_size=6)
    old_v, old_a = ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG
    ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG = small_v, small_a
    try:
        torch.manual_seed(0)
        ref = ref_cap.AVCaptioningDual(
            vocab=_Vocab(), teacher_forcing_ratio=1.0,
            reconstructor_type=rec_type, device="cpu",
        ).eval()
    finally:
        ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG = old_v, old_a

    ours = AVCaptioningDual(
        vocab_size=V, teacher_forcing_ratio=1.0, reconstructor_type=rec_type,
        visual_decoder_config=DecoderConfig(in_feature_size=18, rnn_hidden_size=16,
                                            embedding_size=8, attn_size=6),
        audio_decoder_config=DecoderConfig(in_feature_size=10, rnn_hidden_size=16,
                                           embedding_size=8, attn_size=6),
    )
    params = {
        "v_decoder": convert_decoder_state_dict(ref.v_decoder.state_dict()),
        "a_decoder": convert_decoder_state_dict(ref.a_decoder.state_dict()),
        "v_reconstructor": convert_reconstructor_state_dict(
            ref.v_reconstructor.state_dict() if ref.v_reconstructor else None),
        "a_reconstructor": convert_reconstructor_state_dict(
            ref.a_reconstructor.state_dict() if ref.a_reconstructor else None),
    }
    return ref, ours, params


@pytest.mark.parametrize("rec_type", ["none", "global", "local"])
def test_dual_forward_and_loss_parity(rng, rec_type):
    ref, ours, params = _make_pair(rec_type)
    B, T, L = 3, 4, 7
    audio = rng.normal(size=(B, T, 10)).astype(np.float32)
    visual = rng.normal(size=(B, T, 18)).astype(np.float32)
    captions = rng.integers(3, V, size=(L, B)).astype(np.int64)
    captions[0] = SOS_ID
    captions[-1, 0] = 0  # a PAD to exercise masking

    with torch.no_grad():
        ref_out, ref_arec, ref_vrec = ref(
            torch.tensor(audio), torch.tensor(visual), torch.tensor(captions),
            teacher_forcing_ratio=1.0,
        )
    out, arec, vrec = ours.forward(
        params, jnp.asarray(audio), jnp.asarray(visual),
        jnp.asarray(captions.astype(np.int32)), rng=jax.random.PRNGKey(0),
        teacher_forcing_ratio=1.0,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=2e-4, atol=1e-5)
    if rec_type == "none":
        assert arec is None and ref_arec is None
    else:
        np.testing.assert_allclose(np.asarray(arec), ref_arec.numpy(), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vrec), ref_vrec.numpy(), rtol=2e-4, atol=1e-5)

    # loss parity (bug-compat entropy axis), reference losses imported directly
    from losses import ModalityWiseReconstructionLoss as RefLoss

    with torch.no_grad():
        r = RefLoss(
            ref_out, torch.tensor(captions),
            torch.tensor(audio), ref_arec, torch.tensor(visual), ref_vrec,
            reg_lambda=0.5, audio_recon_lambda=2.0, visual_recon_lambda=3.0,
            rec_type=rec_type,
        )
    o = our_losses.modality_wise_reconstruction_loss(
        out, jnp.asarray(captions.astype(np.int32)),
        jnp.asarray(audio), arec, jnp.asarray(visual), vrec,
        reg_lambda=0.5, audio_recon_lambda=2.0, visual_recon_lambda=3.0,
        rec_type=rec_type, compat_batch_axis_entropy=True,
    )
    for ours_v, ref_v, name in zip(o, r, ("loss", "ce", "ent", "a_rec", "v_rec")):
        np.testing.assert_allclose(
            float(ours_v), float(ref_v.mean()), rtol=2e-4, atol=1e-5, err_msg=name
        )


def test_dual_greedy_predict_parity(rng):
    ref, ours, params = _make_pair("none")
    B, T = 2, 5
    audio = rng.normal(size=(B, T, 10)).astype(np.float32)
    visual = rng.normal(size=(B, T, 18)).astype(np.float32)

    tokens = np.asarray(ours.predict_tokens(
        params, jnp.asarray(audio), jnp.asarray(visual), max_caption_len=8, mode="direct"
    ))

    class _V2:
        itos = {i: f"w{i}" for i in range(V)}
        def __len__(self):
            return V
        def decode_indexes(self, idx):
            words = []
            for i in idx:
                i = int(i)
                if i == 2:
                    break
                words.append(self.itos[i])
            return " ".join(words)

    ref.vocab = _V2()
    with torch.no_grad():
        ref_caps = ref.predict(torch.tensor(audio), torch.tensor(visual),
                               max_caption_len=8, mode="direct")
    from mvc_tpu.models.captioning import captions_from_tokens

    ours_caps = captions_from_tokens(_V2(), tokens)
    assert ours_caps == ref_caps
