"""Failure-detection behaviors (SURVEY.md §5): corrupt/mismatched checkpoints
fall back to fresh parameters, and the extractor's per-clip fallback isolates
broken files."""

import numpy as np
import jax

from mvc_tpu.config import DecoderConfig, TrainerConfig
from mvc_tpu.data import get_loader
from mvc_tpu.models import AVCaptioningDual
from mvc_tpu.training import Trainer, load_checkpoint
from mvc_tpu.training.checkpoint import save_checkpoint

CFGS = dict(
    visual_decoder_config=DecoderConfig(in_feature_size=2048, rnn_hidden_size=16,
                                        embedding_size=8, attn_size=6),
    audio_decoder_config=DecoderConfig(in_feature_size=128, rnn_hidden_size=16,
                                       embedding_size=8, attn_size=6),
)


def test_corrupt_checkpoint_falls_back(tmp_path):
    p = tmp_path / "broken.ckpt"
    p.write_bytes(b"not a pickle at all")
    assert load_checkpoint(str(p)) is None


def test_trainer_survives_corrupt_checkpoint(synthetic_msvd, tmp_path):
    kw = dict(root_dir=str(synthetic_msvd), dataset="MSVD", batch_size=6,
              vocab_path=str(synthetic_msvd / "metadata" / "vocab.json"),
              frame_buckets=(8,), caption_buckets=(12,), verbose=False)
    train_loader, _ = get_loader(split="train", **kw)
    val_loader, _ = get_loader(split="val", **kw)
    vocab = train_loader.dataset.vocab

    ckpt = tmp_path / "t.ckpt"
    ckpt.write_bytes(b"garbage")

    cfg = TrainerConfig()
    cfg.epochs = 1
    cfg.batch_size = 6
    cfg.frame_buckets = (8,)
    cfg.caption_buckets = (12,)
    cfg.eval_max_caption_len = 12

    model = AVCaptioningDual(vocab_size=len(vocab), teacher_forcing_ratio=1.0, **CFGS)
    params = model.init(jax.random.PRNGKey(0))
    trainer = Trainer(checkpoint_name=str(ckpt), log_dir=None, eval_freq=5)
    _, _, history = trainer.fit(model, params, train_loader, val_loader, val_loader, cfg)
    assert len(history["train_loss"]) == 1   # trained fresh despite the garbage file


def test_structure_mismatch_falls_back(tmp_path):
    """A checkpoint from a different model family loads as fresh params."""
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(str(ckpt), {"epoch": 3, "params": {"something": np.zeros(3)}})
    trainer = Trainer(checkpoint_name=str(ckpt), log_dir=None)
    params = {"v_decoder": {"x": np.ones(2)}}
    out, loaded = trainer._load(params)
    assert loaded is None
    np.testing.assert_array_equal(out["v_decoder"]["x"], np.ones(2))
