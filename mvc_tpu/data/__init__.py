from mvc_tpu.data.vocabulary import Vocabulary, build_msvd_vocab, build_msr_vtt_vocab
from mvc_tpu.data.metadata import read_msvd_metadata, read_msr_vtt_metadata
from mvc_tpu.data.dataset import (
    VideoCaptioningDataset,
    VideoCaptionsDataset,
    video_dataset_to_video_captions_loader,
)
from mvc_tpu.data.loader import get_loader, DataLoader

__all__ = [
    "Vocabulary",
    "build_msvd_vocab",
    "build_msr_vtt_vocab",
    "read_msvd_metadata",
    "read_msr_vtt_metadata",
    "VideoCaptioningDataset",
    "VideoCaptionsDataset",
    "video_dataset_to_video_captions_loader",
    "get_loader",
    "DataLoader",
]
