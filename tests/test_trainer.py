"""End-to-end tiny training: one Trainer.fit over the synthetic dataset on the
8-device CPU mesh (dp=4, tp=2), with checkpoint/resume and overfit checks —
the integration tier the reference lacks (SURVEY.md §4)."""

import os

import numpy as np
import jax
import pytest

from mvc_tpu.config import DecoderConfig, TrainerConfig
from mvc_tpu.data import get_loader
from mvc_tpu.models import AVCaptioningDual
from mvc_tpu.parallel import make_mesh
from mvc_tpu.training import Trainer, load_checkpoint
from mvc_tpu.training.optimizer import PlateauScheduler

# Tiny decoders (feature dims fixed by the data contract) keep XLA compile
# times test-friendly.
V_CFG = DecoderConfig(in_feature_size=2048, rnn_hidden_size=32, embedding_size=16, attn_size=8)
A_CFG = DecoderConfig(in_feature_size=128, rnn_hidden_size=32, embedding_size=16, attn_size=8)


def _model(vocab, rec_type="none"):
    return AVCaptioningDual(
        vocab_size=len(vocab), teacher_forcing_ratio=1.0, reconstructor_type=rec_type,
        visual_decoder_config=V_CFG, audio_decoder_config=A_CFG,
    )


def _loaders(synthetic_msvd, batch_size=6):
    kw = dict(
        root_dir=str(synthetic_msvd), dataset="MSVD", batch_size=batch_size,
        vocab_path=str(synthetic_msvd / "metadata" / "vocab.json"),
        frame_buckets=(8,), caption_buckets=(12,), verbose=False,
    )
    train_loader, _ = get_loader(split="train", **kw)
    val_loader, _ = get_loader(split="val", **kw)
    return train_loader, val_loader


@pytest.mark.parametrize("rec_type", ["none", "global"])
def test_fit_end_to_end(synthetic_msvd, tmp_path, rec_type):
    train_loader, val_loader = _loaders(synthetic_msvd)
    vocab = train_loader.dataset.vocab
    model = _model(vocab, rec_type)
    params = model.init(jax.random.PRNGKey(0))

    cfg = TrainerConfig()
    cfg.epochs = 2
    cfg.batch_size = 6
    cfg.lr = 5e-3
    cfg.frame_buckets = (8,)
    cfg.caption_buckets = (12,)
    cfg.eval_max_caption_len = 12

    mesh = make_mesh(dp=4, tp=2)
    ckpt = str(tmp_path / f"test_{rec_type}.ckpt")
    trainer = Trainer(checkpoint_name=ckpt, log_dir=None, eval_freq=2, mesh=mesh)
    params, opt_state, history = trainer.fit(
        model, params, train_loader, val_loader, val_loader, cfg
    )

    assert len(history["train_loss"]) == 2
    assert len(history["val_score"]) == 1
    assert np.isfinite(history["train_loss"][-1]["total"])
    # training reduces the loss on this tiny overfit set
    assert history["train_loss"][-1]["ce"] < history["train_loss"][0]["ce"]
    assert "CIDEr" in history["val_score"][0]
    assert os.path.isfile(ckpt.replace(".ckpt", "_last.ckpt"))


def test_resume_from_checkpoint(synthetic_msvd, tmp_path):
    train_loader, val_loader = _loaders(synthetic_msvd)
    vocab = train_loader.dataset.vocab
    model = _model(vocab)

    cfg = TrainerConfig()
    cfg.epochs = 1
    cfg.batch_size = 6
    cfg.lr = 1e-3
    cfg.frame_buckets = (8,)
    cfg.caption_buckets = (12,)
    cfg.eval_max_caption_len = 12

    ckpt = str(tmp_path / "resume.ckpt")
    t1 = Trainer(checkpoint_name=ckpt, log_dir=None, eval_freq=1)
    params = model.init(jax.random.PRNGKey(0))
    t1.fit(model, params, train_loader, val_loader, val_loader, cfg)
    assert os.path.isfile(ckpt)
    saved = load_checkpoint(ckpt)
    assert saved["epoch"] == 1
    assert "opt_state" in saved and saved["opt_state"] is not None

    # second fit resumes at epoch 2 and extends history
    cfg.epochs = 2
    t2 = Trainer(checkpoint_name=ckpt, log_dir=None, eval_freq=1)
    params2 = model.init(jax.random.PRNGKey(1))
    _, _, history = t2.fit(model, params2, train_loader, val_loader, val_loader, cfg)
    assert t2.previous_epochs == 1
    assert len(history["train_loss"]) == 2


def test_plateau_scheduler_semantics():
    s = PlateauScheduler(lr=1.0, factor=0.5, patience=2, min_lr=0.1, mode="max")
    for m in (0.5, 0.6, 0.7):
        assert s.step(m) == 1.0           # improving
    assert s.step(0.7) == 1.0             # bad 1
    assert s.step(0.69) == 1.0            # bad 2
    assert s.step(0.68) == 0.5            # bad 3 > patience -> decay
    # decays clamp at min_lr
    for _ in range(20):
        lr = s.step(0.0)
    assert lr == 0.1

    state = s.state_dict()
    s2 = PlateauScheduler(lr=9.0, mode="max")
    s2.load_state_dict(state)
    assert s2.lr == s.lr and s2.best == s.best


class _RecordingWriter:
    def __init__(self):
        self.tags = []

    def add_scalar(self, tag, value, step):
        self.tags.append(tag)

    def close(self):
        pass


def test_eval_logs_all_nlp_scalars(synthetic_msvd):
    """Eval must expose every NLPScore key (incl. METEOR) as a TB scalar
    under the reference tag scheme {phase}/score/{mode}/{name}."""
    from mvc_tpu.data.dataset import video_dataset_to_video_captions_loader

    train_loader, val_loader = _loaders(synthetic_msvd)
    vocab = train_loader.dataset.vocab
    model = _model(vocab)
    params = model.init(jax.random.PRNGKey(0))
    vidcap = video_dataset_to_video_captions_loader(
        val_loader.dataset, batch_size=6, frame_buckets=(8,)
    )

    trainer = Trainer(checkpoint_name="unused", log_dir=None, eval_freq=1)
    trainer.set_vocab(vocab)
    rec = _RecordingWriter()
    trainer.summary_writer = rec
    scores, vid_gt, vid_gen = trainer.eval(
        model, params, vidcap, "val", epoch=1, max_caption_len=12
    )
    for name in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert f"val/score/direct/{name}" in rec.tags
        assert np.isfinite(scores[name])


def test_device_feature_cache_equivalence(synthetic_msvd, tmp_path):
    """Cached-feature training (VERDICT r1 #8) must match the uncached path
    exactly: same per-epoch losses, same final eval scores."""
    histories = {}
    for cached in (False, True):
        train_loader, val_loader = _loaders(synthetic_msvd)
        train_loader.shuffle = False
        val_loader.shuffle = False
        vocab = train_loader.dataset.vocab
        model = _model(vocab, "global")
        params = model.init(jax.random.PRNGKey(0))

        cfg = TrainerConfig()
        cfg.epochs = 2
        cfg.batch_size = 6
        cfg.lr = 5e-3
        cfg.frame_buckets = (8,)
        cfg.caption_buckets = (12,)
        cfg.eval_max_caption_len = 12
        cfg.transfer_dtype = None
        cfg.device_feature_cache = cached

        trainer = Trainer(checkpoint_name=str(tmp_path / f"cache{cached}.ckpt"),
                          log_dir=None, eval_freq=2)
        _, _, history = trainer.fit(model, params, train_loader, val_loader, val_loader, cfg)
        histories[cached] = history
        if cached:
            assert train_loader.feature_cache is not None

    for e in range(2):
        for k in ("total", "ce", "a_recon", "v_recon"):
            np.testing.assert_allclose(
                histories[True]["train_loss"][e][k],
                histories[False]["train_loss"][e][k],
                rtol=1e-5, atol=1e-6, err_msg=f"train {k} epoch {e}",
            )
            np.testing.assert_allclose(
                histories[True]["val_loss"][e][k],
                histories[False]["val_loss"][e][k],
                rtol=1e-5, atol=1e-6, err_msg=f"val {k} epoch {e}",
            )
    assert histories[True]["val_score"][0]["CIDEr"] == pytest.approx(
        histories[False]["val_score"][0]["CIDEr"], rel=1e-6
    )


def test_device_feature_cache_equivalence_unmasked_oversize_bucket(synthetic_msvd, tmp_path):
    """With the bug-compat mask_padded_features=False and a frame bucket ABOVE
    the data's max length, the padded zero frames are attended (softmax
    denominators include them) — the cached path must pad to the same bucket
    as the uncached collator, not clamp to the data's max (review finding)."""
    histories = {}
    for cached in (False, True):
        train_loader, val_loader = _loaders(synthetic_msvd)
        train_loader.shuffle = False
        val_loader.shuffle = False
        vocab = train_loader.dataset.vocab
        model = _model(vocab, "global")
        params = model.init(jax.random.PRNGKey(0))

        cfg = TrainerConfig()
        cfg.epochs = 1
        cfg.batch_size = 6
        cfg.lr = 5e-3
        cfg.frame_buckets = (12,)          # > synthetic max length (8)
        cfg.caption_buckets = (12,)
        cfg.eval_max_caption_len = 12
        cfg.transfer_dtype = None
        cfg.mask_padded_features = False   # PARITY bug-compat switch
        cfg.device_feature_cache = cached

        trainer = Trainer(checkpoint_name=str(tmp_path / f"um{cached}.ckpt"),
                          log_dir=None, eval_freq=1)
        _, _, history = trainer.fit(model, params, train_loader, val_loader,
                                    val_loader, cfg)
        histories[cached] = history

    for k in ("total", "ce", "a_recon", "v_recon"):
        np.testing.assert_allclose(
            histories[True]["train_loss"][0][k],
            histories[False]["train_loss"][0][k],
            rtol=1e-5, atol=1e-6, err_msg=f"train {k}",
        )


def test_device_feature_cache_int8_dequantizes(synthetic_msvd):
    """int8 cache must quantize with per-(clip, frame) max-abs scales and
    dequantize on gather — a raw astype(int8) truncates normalized features
    to {-1, 0, 1} (review finding)."""
    import jax.numpy as jnp

    from mvc_tpu.data.feature_cache import DeviceFeatureCache, gather_features

    train_loader, _ = _loaders(synthetic_msvd)
    ds = train_loader.dataset
    f32 = DeviceFeatureCache(ds, dtype="float32", frame_buckets=(12,))
    q8 = DeviceFeatureCache(ds, dtype="int8", frame_buckets=(12,))
    assert q8.t_store == 12 and f32.t_store == 12

    rows = jnp.arange(len(q8.row_of))
    a_ref, v_ref, m_ref = gather_features(f32.arrays(), rows, 12)
    a_q, v_q, m_q = gather_features(q8.arrays(), rows, 12)
    np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_q))
    # max-abs per-frame quantization: <=1% of the per-frame scale
    for ref, got in ((a_ref, a_q), (v_ref, v_q)):
        ref, got = np.asarray(ref), np.asarray(got)
        scale = np.max(np.abs(ref), axis=2, keepdims=True)
        np.testing.assert_allclose(got, ref, atol=float(scale.max()) / 127 + 1e-7)
        assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.999


def test_bf16_compute_train_step_parity():
    """Mixed precision (--dtype bfloat16): the train step pre-casts f32
    master params to bf16 once per step (trainer._build_train_step), so the
    scan-streamed weights move at half width.  Params and Adam state must
    stay f32; losses must track the f32 run closely over several steps."""
    import jax.numpy as jnp

    from mvc_tpu.training import optimizer as opt_lib

    gen = np.random.default_rng(0)
    B, T, L, V = 6, 8, 10, 50
    batch = {
        "audio": jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32)),
        "visual": jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32)),
        "captions": jnp.asarray(np.concatenate([
            np.full((1, B), 1, np.int32),
            gen.integers(3, V, size=(L - 1, B), dtype=np.int32),
        ])),
        "feat_mask": jnp.ones((B, T), bool),
    }
    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model = AVCaptioningDual(
            vocab_size=V, teacher_forcing_ratio=1.0, reconstructor_type="global",
            visual_decoder_config=V_CFG, audio_decoder_config=A_CFG, dtype=dtype,
        )
        params = model.init(jax.random.PRNGKey(0))
        cfg = TrainerConfig()
        tr = Trainer(checkpoint_name="bf16_parity", log_dir=None)
        tr._optimizer = opt_lib.make_optimizer(cfg)
        train_step, _ = tr._build_train_step(model, cfg)
        opt_state = tr._optimizer.init(params)
        trace = []
        for _ in range(5):
            params, opt_state, m = train_step(params, opt_state, batch,
                                              jax.random.PRNGKey(1))
            trace.append(float(m["total"]))
        losses[jnp.dtype(dtype).name] = trace
        # master params stay f32 regardless of compute dtype
        assert all(
            leaf.dtype == np.float32
            for leaf in jax.tree.leaves(params)
            if np.issubdtype(leaf.dtype, np.floating)
        )

    f32, bf16 = losses["float32"], losses["bfloat16"]
    assert all(np.isfinite(x) for x in bf16)
    np.testing.assert_allclose(bf16, f32, rtol=0.02)
    # both descend on repeated steps over the same batch
    assert bf16[-1] < bf16[0]
