"""Script-level smoke tests for the notebook-replacement CLIs."""

import json
import subprocess
import sys


def test_visualize_history_cli(tmp_path):
    history = {
        "train_loss": [{"total": 3.0, "ce": 2.5}, {"total": 2.0, "ce": 1.7}],
        "val_loss": [{"total": 3.2}, {"total": 2.4}],
        "val_score": [{"CIDEr": 0.5, "Bleu_4": 0.1}, {"CIDEr": 0.9, "Bleu_4": 0.2}],
    }
    hist_path = tmp_path / "run.json"
    hist_path.write_text(json.dumps(history))
    out = tmp_path / "plot.png"
    r = subprocess.run(
        [sys.executable, "scripts/visualize_history.py", str(hist_path), "-o", str(out)],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert out.is_file() and out.stat().st_size > 0


def test_build_vocab_cli(tmp_path):
    import pandas as pd

    root = tmp_path / "MSVD" / "metadata"
    root.mkdir(parents=True)
    rows = [{"Description": "a man plays guitar"} for _ in range(6)]
    pd.DataFrame(rows).to_csv(root / "train.csv", index=False)
    pd.DataFrame(rows).to_csv(root / "val.csv", index=False)
    r = subprocess.run(
        [sys.executable, "scripts/build_vocab.py", "--dataset", "MSVD",
         "--data_root", str(tmp_path)],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert (root / "vocab.json").is_file()

    from mvc_tpu.data import Vocabulary

    vocab = Vocabulary.load(str(root / "vocab.json"))
    assert "guitar" in vocab.stoi


def test_rehearse_real_data_synthetic(tmp_path):
    """The real-data rehearsal runbook end to end with synthetic stand-ins:
    oracle-weight conversion -> batched extraction -> vocab -> 1-epoch fit
    with device feature cache -> scores (scripts/rehearse_real_data.py).
    With MVC_WEIGHTS_DIR/MVC_DATA_DIR mounted the same path runs on real
    checkpoints/media (reference src/extract_features.py:109-166 +
    src/train.py:351-549)."""
    import importlib.util
    import os

    import pytest

    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 unavailable")
    spec = importlib.util.spec_from_file_location(
        "rehearse_real_data",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "rehearse_real_data.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    os.environ.pop("MVC_WEIGHTS_DIR", None)
    os.environ.pop("MVC_DATA_DIR", None)
    summary = mod.main([
        "--out", str(tmp_path), "--epochs", "1", "--batch_size", "4",
        "--eval_mode", "direct", "--reconstructor", "none",
        "--n_clips", "3", "--clip_seconds", "2.0", "--frame_bucket", "8",
    ])
    assert summary["extracted"]["done"] >= 1
    assert summary["extracted"]["failures"] == 0
    assert summary["real_weights"] is False and summary["real_data"] is False
    import numpy as np

    assert np.isfinite(summary["final_train_loss"])
    assert "CIDEr" in summary["val_score"]
