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
