"""Mid-training crash/resume trajectory equality (VERDICT r4 item 8).

A REAL kill: the training process is SIGKILLed after epoch k's checkpoint
lands on disk (atomic tmp+rename writes make the kill safe at any instant),
then a fresh process resumes from that checkpoint.  The resumed run's loss
trajectory and final eval must match an uninterrupted run exactly — which
requires optimizer moments, plateau-scheduler state, epoch-keyed RNG, and
history all restored (reference resume semantics src/train.py:43-63 are the
contract floor; the reference restores none of the optimizer state).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

RUNNER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

root, ckpt, out_json, epochs = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])

from mvc_tpu.config import DecoderConfig, TrainerConfig
from mvc_tpu.data import get_loader
from mvc_tpu.models import AVCaptioningDual
from mvc_tpu.training import Trainer

kw = dict(root_dir=root, dataset="MSVD", batch_size=6,
          vocab_path=os.path.join(root, "metadata", "vocab.json"),
          frame_buckets=(8,), caption_buckets=(12,), verbose=False,
          shuffle=False)
train_loader, _ = get_loader(split="train", **kw)
val_loader, _ = get_loader(split="val", **kw)
vocab = train_loader.dataset.vocab

model = AVCaptioningDual(
    vocab_size=len(vocab), teacher_forcing_ratio=1.0, reconstructor_type="global",
    visual_decoder_config=DecoderConfig(in_feature_size=2048, rnn_hidden_size=32,
                                        embedding_size=16, attn_size=8),
    audio_decoder_config=DecoderConfig(in_feature_size=128, rnn_hidden_size=32,
                                       embedding_size=16, attn_size=8),
)
cfg = TrainerConfig()
cfg.epochs = epochs
cfg.batch_size = 6
cfg.lr = 1e-3
cfg.frame_buckets = (8,)
cfg.caption_buckets = (12,)
cfg.eval_max_caption_len = 12
cfg.seed = 7

tr = Trainer(checkpoint_name=ckpt, log_dir=None, eval_freq=1)
params = model.init(jax.random.PRNGKey(0))
_, _, history = tr.fit(model, params, train_loader, val_loader, val_loader, cfg)
with open(out_json, "w") as f:
    json.dump({
        "train_loss": [m["total"] for m in history["train_loss"]],
        "val_loss": [m["total"] for m in history["val_loss"]],
        "val_cider": [s["CIDEr"] for s in history["val_score"]],
    }, f)
"""


def _spawn(tmp_path, root, ckpt, out, epochs):
    runner = tmp_path / "runner.py"
    runner.write_text(RUNNER)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)   # single-device child: no virtual mesh needed
    return subprocess.Popen(
        [sys.executable, str(runner), str(root), ckpt, out, str(epochs)],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


@pytest.mark.slow
def test_sigkill_after_epoch_k_then_resume_matches_uninterrupted(
        synthetic_msvd, tmp_path):
    from mvc_tpu.training import load_checkpoint

    epochs, k = 4, 2

    # --- uninterrupted run -------------------------------------------------
    out_a = str(tmp_path / "a.json")
    p = _spawn(tmp_path, synthetic_msvd, str(tmp_path / "a.ckpt"), out_a, epochs)
    assert p.wait(timeout=900) == 0
    base = json.load(open(out_a))
    assert len(base["train_loss"]) == epochs

    # --- crashed run: SIGKILL once epoch k's checkpoint is loadable --------
    ckpt = str(tmp_path / "b.ckpt")
    out_b = str(tmp_path / "b.json")
    p = _spawn(tmp_path, synthetic_msvd, ckpt, out_b, epochs)
    deadline = time.time() + 900
    killed_at = None
    while time.time() < deadline:
        if p.poll() is not None:
            pytest.fail("training process finished before the kill "
                        f"(rc={p.returncode}) — raise epochs")
        saved = load_checkpoint(ckpt)
        if saved is not None and saved.get("epoch", 0) >= k:
            killed_at = saved["epoch"]
            os.kill(p.pid, signal.SIGKILL)
            break
        time.sleep(0.2)
    assert killed_at is not None, "epoch-k checkpoint never appeared"
    p.wait(timeout=60)
    assert not os.path.exists(out_b), "kill landed after training finished"

    # --- fresh process resumes from the async checkpoint -------------------
    p = _spawn(tmp_path, synthetic_msvd, ckpt, out_b, epochs)
    assert p.wait(timeout=900) == 0
    resumed = json.load(open(out_b))

    # The resumed process re-runs epochs killed_at+1..N; its history carries
    # the restored prefix.  Trajectory equality must be EXACT-ish: optimizer
    # moments + scheduler + epoch-keyed RNG + deterministic loaders make the
    # continuation the same computation on the same machine.
    assert len(resumed["train_loss"]) == epochs
    np.testing.assert_allclose(resumed["train_loss"], base["train_loss"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(resumed["val_loss"], base["val_loss"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(resumed["val_cider"], base["val_cider"],
                               rtol=1e-6, atol=1e-7)
