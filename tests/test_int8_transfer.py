"""int8 feature-transfer path: bounded quantization error and end-to-end
training still learns."""

import numpy as np
import jax

from mvc_tpu.config import DecoderConfig, TrainerConfig
from mvc_tpu.data import get_loader
from mvc_tpu.models import AVCaptioningDual
from mvc_tpu.training import Trainer


def test_put_batch_int8_roundtrip(rng):
    t = Trainer(checkpoint_name="/tmp/none.ckpt", log_dir=None)
    t._transfer_int8 = True
    batch = {
        "audio": rng.normal(size=(3, 4, 128)).astype(np.float32) * 5,
        "visual": rng.normal(size=(3, 4, 2048)).astype(np.float32),
        "captions": np.ones((6, 3), np.int32),
        "feat_mask": np.ones((3, 4), bool),
        "sample_mask": np.ones((3,), bool),
    }
    out = t._put_batch(batch)
    a = np.asarray(out["audio"])
    v = np.asarray(out["visual"])
    assert a.dtype == np.float32 and "audio_scale" not in out
    # per-row max-abs quantization: relative error <= 1/127 of the row max
    np.testing.assert_allclose(
        a, batch["audio"], atol=np.abs(batch["audio"]).max() / 127 + 1e-6
    )
    np.testing.assert_allclose(
        v, batch["visual"], atol=np.abs(batch["visual"]).max() / 127 + 1e-6
    )
    assert np.asarray(out["captions"]).dtype == np.int32


def test_int8_training_learns(synthetic_msvd):
    kw = dict(root_dir=str(synthetic_msvd), dataset="MSVD", batch_size=6,
              vocab_path=str(synthetic_msvd / "metadata" / "vocab.json"),
              frame_buckets=(8,), caption_buckets=(12,), verbose=False)
    train_loader, _ = get_loader(split="train", **kw)
    val_loader, _ = get_loader(split="val", **kw)
    vocab = train_loader.dataset.vocab

    cfg = TrainerConfig()
    cfg.epochs = 2
    cfg.batch_size = 6
    cfg.lr = 5e-3
    cfg.frame_buckets = (8,)
    cfg.caption_buckets = (12,)
    cfg.eval_max_caption_len = 12
    cfg.transfer_dtype = "int8"

    model = AVCaptioningDual(
        vocab_size=len(vocab), teacher_forcing_ratio=1.0,
        visual_decoder_config=DecoderConfig(in_feature_size=2048, rnn_hidden_size=32,
                                            embedding_size=16, attn_size=8),
        audio_decoder_config=DecoderConfig(in_feature_size=128, rnn_hidden_size=32,
                                           embedding_size=16, attn_size=8),
    )
    params = model.init(jax.random.PRNGKey(0))
    trainer = Trainer(checkpoint_name="/tmp/int8_test.ckpt", log_dir=None, eval_freq=5)
    _, _, history = trainer.fit(model, params, train_loader, val_loader, val_loader, cfg)
    assert history["train_loss"][-1]["ce"] < history["train_loss"][0]["ce"]
