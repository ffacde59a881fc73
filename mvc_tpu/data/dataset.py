"""Datasets over precomputed ``.npy`` feature pairs.

Replicates the reference's per-item semantics exactly
(reference src/get_loader.py:185-319):

- one training item per (video, caption) pair
- caption tokens = ``<SOS> + numericalize + <EOS>``
- 1-frame audio features of shape ``(128,)`` reshaped to ``(-1, 128)``
- both modalities truncated to ``min(n_frames)``
- optional frame-sum normalization
- ``video_only`` zeroes the audio features

The TPU divergence is in *collation*: XLA wants static shapes, so batches are
padded to bucketed maxima with explicit masks instead of the reference's
per-batch dynamic ``pad_sequence`` (src/get_loader.py:392-413).  With
attention/loss masking enabled (the default) the extra padding is numerically
inert.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mvc_tpu.config import AUDIO_FEATURE_DIM, PAD_ID
from mvc_tpu.data.metadata import read_msr_vtt_metadata, read_msvd_metadata
from mvc_tpu.data.vocabulary import Vocabulary


def load_clip_features(
    root_dir: str, video_id: str, normalize: bool = False, video_only: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Load the (audio, visual) feature pair for one clip with the
    reference's quick fixes (reference src/get_loader.py:242-266)."""
    video_features = np.load(os.path.join(root_dir, "features", "video", f"{video_id}.npy"))
    audio_features = np.load(os.path.join(root_dir, "features", "audio", f"{video_id}.npy"))

    if audio_features.ndim < 2:
        audio_features = audio_features.reshape((-1, AUDIO_FEATURE_DIM))

    n_frames = min(video_features.shape[0], audio_features.shape[0])
    video_features = np.asarray(video_features[:n_frames], dtype=np.float32)
    audio_features = np.asarray(audio_features[:n_frames], dtype=np.float32)

    if normalize:
        video_features = video_features / np.sum(video_features, axis=1, keepdims=True)
        audio_features = audio_features / np.sum(audio_features, axis=1, keepdims=True)

    if video_only:
        audio_features = audio_features * 0

    return audio_features, video_features


def _read_metadata(root_dir: str, dataset: str, split: str, verbose: bool = True):
    assert dataset in ("MSVD", "MSR-VTT"), "Dataset must be one of ['MSVD', 'MSR-VTT']"
    assert split in ("train", "val", "test", "tiny"), (
        "Wrong split specified, must be one of ['train', 'val', 'test', 'tiny']"
    )
    if dataset == "MSVD" or split == "tiny":
        return read_msvd_metadata(root_dir, split, verbose=verbose)
    return read_msr_vtt_metadata(root_dir, split, verbose=verbose)


class VideoCaptioningDataset:
    """One item per (video, caption) pair
    (reference src/get_loader.py:185-268)."""

    def __init__(
        self,
        root_dir: str,
        dataset: str = "MSVD",
        split: str = "train",
        freq_threshold: int = 5,
        vocab_path: Optional[str] = None,
        normalize: bool = False,
        video_only: bool = False,
        verbose: bool = True,
    ):
        assert os.path.isdir(root_dir), "The dataset root directory does not exist"
        assert os.path.isdir(os.path.join(root_dir, "metadata")), "metadata directory missing"
        assert os.path.isdir(os.path.join(root_dir, "features")), "features directory missing"
        self.root_dir = root_dir
        self.normalize = normalize
        self.video_only = video_only
        self.metadata = _read_metadata(root_dir, dataset, split, verbose=verbose)

        if vocab_path is None:
            if verbose:
                print("Building Vocab")
            self.vocab = Vocabulary(freq_threshold)
            self.vocab.build_vocabulary(self.metadata["caption"].tolist())
        else:
            if verbose:
                print(f"Loading Vocab: {vocab_path}")
            self.vocab = Vocabulary.load(vocab_path)

    def __len__(self) -> int:
        return len(self.metadata)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.metadata.iloc[index]
        video_id, caption = row["video_id"], row["caption"]
        caption_ids = np.asarray(self.vocab.encode_caption(caption), dtype=np.int32)
        audio, visual = load_clip_features(
            self.root_dir, video_id, normalize=self.normalize, video_only=self.video_only
        )
        return {"video_id": video_id, "audio": audio, "visual": visual, "caption": caption_ids}


class VideoCaptionsDataset:
    """One item per *video* with the list of all its ground-truth captions —
    the evaluation-side dataset (reference src/get_loader.py:271-319)."""

    def __init__(
        self,
        root_dir: str,
        vid_cap_dict: Dict[str, List[str]],
        normalize: bool = False,
        video_only: bool = False,
    ):
        self.root_dir = root_dir
        self.normalize = normalize
        self.video_only = video_only
        self.vid_cap_dict = vid_cap_dict
        self.video_ids = list(vid_cap_dict.keys())

    def __len__(self) -> int:
        return len(self.video_ids)

    def __getitem__(self, index: int) -> Dict[str, object]:
        video_id = self.video_ids[index]
        audio, visual = load_clip_features(
            self.root_dir, video_id, normalize=self.normalize, video_only=self.video_only
        )
        return {
            "video_id": video_id,
            "audio": audio,
            "visual": visual,
            "captions": self.vid_cap_dict[video_id],
        }


def video_dataset_to_video_captions_loader(
    dataset: VideoCaptioningDataset,
    batch_size: int = 32,
    normalize: bool = False,
    video_only: bool = False,
    frame_buckets: Sequence[int] = (8, 16, 32, 48, 64),
):
    """Group a (video, caption)-pair dataset by video and wrap it in an
    unshuffled eval loader; ground-truth captions are passed through
    ``apply_vocab`` so OOV words become the literal ``"<UNK>"``
    (reference src/get_loader.py:346-367)."""
    from mvc_tpu.data.loader import EvalDataLoader

    df = dataset.metadata[["video_id", "caption"]].copy()
    df["caption"] = df["caption"].apply(dataset.vocab.apply_vocab)
    vid_captions = df.groupby("video_id", sort=False)["caption"].apply(list).to_dict()

    eval_dataset = VideoCaptionsDataset(
        dataset.root_dir, vid_captions, normalize=normalize, video_only=video_only
    )
    return EvalDataLoader(eval_dataset, batch_size=batch_size, frame_buckets=frame_buckets)


# ---------------------------------------------------------------- collation


def _bucket(value: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= value; above the ladder the bucket auto-extends to
    the next multiple of the top rung, so no sample is ever truncated (the
    reference pads to the true batch max, src/get_loader.py:404-413; the
    multiple-of-top rule keeps the set of compiled shapes bounded)."""
    for b in buckets:
        if value <= b:
            return b
    top = buckets[-1]
    return ((value + top - 1) // top) * top


def collate_av_batch(
    items: List[Dict[str, np.ndarray]],
    frame_buckets: Sequence[int] = (8, 16, 32, 48, 64),
    caption_buckets: Sequence[int] = (12, 16, 20, 26, 34),
    pad_batch_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Static-shape batch: pad frames/captions to the smallest fitting bucket.

    Returns a dict:
      audio        [B, T, 128]   float32, zero-padded
      visual       [B, T, 2048]  float32, zero-padded
      captions     [L, B]        int32, PAD-padded (time-first, reference contract)
      feat_mask    [B, T]        bool, True on real frames
      sample_mask  [B]           bool, True on real (non batch-padding) rows
    """
    n = len(items)
    b = pad_batch_to or n
    t_max = max(it["audio"].shape[0] for it in items)
    l_max = max(it["caption"].shape[0] for it in items)
    t_pad = _bucket(t_max, frame_buckets)
    l_pad = _bucket(l_max, caption_buckets)

    a_dim = items[0]["audio"].shape[1]
    v_dim = items[0]["visual"].shape[1]
    audio = np.zeros((b, t_pad, a_dim), dtype=np.float32)
    visual = np.zeros((b, t_pad, v_dim), dtype=np.float32)
    captions = np.full((l_pad, b), PAD_ID, dtype=np.int32)
    feat_mask = np.zeros((b, t_pad), dtype=bool)
    sample_mask = np.zeros((b,), dtype=bool)

    for i, it in enumerate(items):
        t = min(it["audio"].shape[0], t_pad)
        l = min(it["caption"].shape[0], l_pad)
        audio[i, :t] = it["audio"][:t]
        visual[i, :t] = it["visual"][:t]
        captions[:l, i] = it["caption"][:l]
        feat_mask[i, :t] = True
        sample_mask[i] = True

    return {
        "audio": audio,
        "visual": visual,
        "captions": captions,
        "feat_mask": feat_mask,
        "sample_mask": sample_mask,
    }


def collate_eval_batch(
    items: List[Dict[str, object]],
    frame_buckets: Sequence[int] = (8, 16, 32, 48, 64),
    pad_batch_to: Optional[int] = None,
) -> Dict[str, object]:
    """Eval batch: features + per-video ground-truth caption lists
    (reference src/get_loader.py:322-343)."""
    n = len(items)
    b = pad_batch_to or n
    t_max = max(it["audio"].shape[0] for it in items)
    t_pad = _bucket(t_max, frame_buckets)

    a_dim = items[0]["audio"].shape[1]
    v_dim = items[0]["visual"].shape[1]
    audio = np.zeros((b, t_pad, a_dim), dtype=np.float32)
    visual = np.zeros((b, t_pad, v_dim), dtype=np.float32)
    feat_mask = np.zeros((b, t_pad), dtype=bool)
    sample_mask = np.zeros((b,), dtype=bool)
    for i, it in enumerate(items):
        t = min(it["audio"].shape[0], t_pad)
        audio[i, :t] = it["audio"][:t]
        visual[i, :t] = it["visual"][:t]
        feat_mask[i, :t] = True
        sample_mask[i] = True

    return {
        "video_ids": [it["video_id"] for it in items],
        "audio": audio,
        "visual": visual,
        "feat_mask": feat_mask,
        "sample_mask": sample_mask,
        "captions": [it["captions"] for it in items],
    }
