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


def test_visualize_history_print_and_dedup(tmp_path):
    """The notebook's remaining surfaces (visualize_history.ipynb cells 4-5):
    --print dumps the raw metric series; --dedup-metadata drops duplicate
    caption rows from the split CSVs in place."""
    import pandas as pd

    history = {
        "train_loss": [{"total": 3.0}], "val_loss": [{"total": 3.2}],
        "val_score": [{"CIDEr": 0.5, "Bleu_1": 0.3, "METEOR": 0.1}],
    }
    hist_path = tmp_path / "run.json"
    hist_path.write_text(json.dumps(history))

    meta = tmp_path / "metadata"
    meta.mkdir()
    rows = [{"VideoID": "v1", "Start": 0, "End": 10, "Source": "clean",
             "Description": "a man plays guitar"}] * 3
    for split in ("train", "val", "test"):
        pd.DataFrame(rows).to_csv(meta / f"{split}.csv", index=False)

    out = tmp_path / "plot.png"
    r = subprocess.run(
        [sys.executable, "scripts/visualize_history.py", str(hist_path),
         "--print", "--dedup-metadata", str(meta), "-o", str(out)],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "CIDEr [0.5]" in r.stdout and "train.csv: 3 -> 1 rows" in r.stdout
    assert out.is_file() and out.stat().st_size > 0
    assert len(pd.read_csv(meta / "val.csv")) == 1


def test_visualize_results_cli(tmp_path):
    """Text mode needs no videos; grid mode renders a frame strip from a
    tiny encoded clip (skipped when no cv2 codec is available)."""
    cap_csv = tmp_path / "captions.csv"
    cap_csv.write_text(
        "video_id,generated,ground_truth\n"
        "vid000_0_10,a man plays guitar,a man is playing a guitar | the man plays\n"
        "vid001_0_10,a dog runs,the dog is running\n"
    )
    r = subprocess.run(
        [sys.executable, "scripts/visualize_results.py",
         "--captions", str(cap_csv), "--print", "-n", "2"],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "Example: vid000_0_10" in r.stdout
    assert "a man is playing a guitar" in r.stdout  # " | " refs split

    import pytest

    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 unavailable")
    import numpy as np

    videos = tmp_path / "videos"
    videos.mkdir()
    vw = cv2.VideoWriter(str(videos / "vid000_0_10.avi"),
                         cv2.VideoWriter_fourcc(*"MJPG"), 5.0, (64, 48))
    if not vw.isOpened():
        pytest.skip("no MJPG codec")
    for i in range(10):
        vw.write(np.full((48, 64, 3), i * 20, np.uint8))
    vw.release()

    out = tmp_path / "grid.png"
    r = subprocess.run(
        [sys.executable, "scripts/visualize_results.py",
         "--dataset", str(tmp_path), "--captions", str(cap_csv),
         "-n", "1", "--frames", "3", "-o", str(out)],
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
