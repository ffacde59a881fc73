"""MSR-VTT metadata pipeline: JSON sentences, id-range splits, vocab build
(reference src/get_loader.py:92-103,166-182)."""

import json

import numpy as np
import pytest

from mvc_tpu.data import VideoCaptioningDataset, get_loader
from mvc_tpu.data.metadata import read_msr_vtt_metadata
from mvc_tpu.data.vocabulary import build_msr_vtt_vocab


@pytest.fixture(scope="module")
def synthetic_msrvtt(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt")
    (root / "metadata").mkdir()
    (root / "features" / "video").mkdir(parents=True)
    (root / "features" / "audio").mkdir(parents=True)

    gen = np.random.default_rng(5)
    sentences = []
    # ids spanning the three split ranges
    for vid_id in [0, 1, 6512, 6513, 7008, 7010, 9998]:
        name = f"video{vid_id}"
        t = int(gen.integers(3, 7))
        np.save(root / "features" / "video" / f"{name}.npy",
                gen.normal(size=(t, 2048)).astype(np.float32))
        np.save(root / "features" / "audio" / f"{name}.npy",
                gen.normal(size=(t, 128)).astype(np.float32))
        for k in range(2):
            sentences.append({"video_id": name, "caption": f"a person does thing {k}"})

    payload = {"sentences": sentences}
    with open(root / "metadata" / "train_val_videodatainfo.json", "w") as f:
        json.dump(payload, f)
    with open(root / "metadata" / "test_videodatainfo.json", "w") as f:
        json.dump(payload, f)
    return root


def test_id_range_splits(synthetic_msrvtt):
    train = read_msr_vtt_metadata(str(synthetic_msrvtt), "train", verbose=False)
    val = read_msr_vtt_metadata(str(synthetic_msrvtt), "val", verbose=False)
    test = read_msr_vtt_metadata(str(synthetic_msrvtt), "test", verbose=False)
    assert set(train.video_id) == {"video0", "video1"}          # 0 <= id < 6512
    assert set(val.video_id) == {"video6513", "video7008"}      # 6513 <= id < 7009
    assert set(test.video_id) == {"video7010", "video9998"}     # 7010 <= id < 9999


def test_msrvtt_dataset_and_loader(synthetic_msrvtt):
    loader, ds = get_loader(
        str(synthetic_msrvtt), dataset="MSR-VTT", split="train", batch_size=4,
        verbose=False,
    )
    assert len(ds) == 4  # 2 videos x 2 captions
    batch = next(iter(loader))
    assert batch["audio"].shape[2] == 128
    assert batch["visual"].shape[2] == 2048


def test_msrvtt_vocab_build(synthetic_msrvtt):
    vocab = build_msr_vtt_vocab(str(synthetic_msrvtt))
    # threshold 5: "a person does thing" appear 10x (train+val ids < 7009)
    assert "person" in vocab.stoi
    assert (synthetic_msrvtt / "metadata" / "vocab.json").is_file()
