"""Dataset metadata readers (reference src/get_loader.py:117-182).

Both readers return a pandas DataFrame with columns ``[video_id, caption]``.
"""

from __future__ import annotations

import json
import os
from typing import Tuple


def _parse_msvd_filename(video_name: str) -> Tuple[str, int, int]:
    """``<VideoID>_<Start>_<End>[.ext]`` -> parts
    (reference src/get_loader.py:125-132)."""
    filename = video_name.split(".")[0]
    parts = filename.split("_")
    video_id = "_".join(parts[:-2])
    return video_id, int(parts[-2]), int(parts[-1])


def read_msvd_metadata(root_dir: str, split: str, verbose: bool = True):
    """MSVD CSV metadata with the reference's integrity filter: drop caption
    rows whose extracted feature file is missing, then keep only rows with
    ``Source == "clean"`` (reference src/get_loader.py:117-163)."""
    import pandas as pd

    captions_file = os.path.join(root_dir, "metadata", f"{split}.csv")
    assert os.path.isfile(captions_file), f"The captions file cannot be found {captions_file}"

    feature_dir = os.path.join(root_dir, "features", "video")
    available = set()
    for f in os.listdir(feature_dir):
        vid, start, end = _parse_msvd_filename(f)
        if os.path.isfile(os.path.join(feature_dir, f)):
            available.add(f"{vid}_{start}_{end}")

    metadata = pd.read_csv(captions_file)
    if verbose:
        print("Before integrity check:", len(metadata))
    keep = metadata.apply(
        lambda r: f"{r['VideoID']}_{r['Start']}_{r['End']}" in available, axis=1
    )
    metadata = metadata[keep]
    if verbose:
        print("After integrity check:", len(metadata))
    metadata = metadata[metadata["Source"] == "clean"]
    if verbose:
        print("After removing unverified:", len(metadata))

    metadata = metadata.assign(
        video_id=metadata.apply(lambda r: f"{r['VideoID']}_{r['Start']}_{r['End']}", axis=1)
    ).rename(columns={"Description": "caption"})
    return metadata[["video_id", "caption"]]


# MSR-VTT id-range splits (reference src/get_loader.py:177).
MSR_VTT_SPLITS = {"train": (0, 6512), "val": (6513, 7009), "test": (7010, 9999)}


def read_msr_vtt_metadata(root_dir: str, split: str, verbose: bool = True):
    """MSR-VTT JSON metadata with id-range splits
    (reference src/get_loader.py:166-182)."""
    import pandas as pd

    if split == "test":
        json_path = os.path.join(root_dir, "metadata", "test_videodatainfo.json")
    else:
        json_path = os.path.join(root_dir, "metadata", "train_val_videodatainfo.json")
    assert os.path.isfile(json_path), f"The captions file cannot be found {json_path}"

    with open(json_path) as f:
        data = json.load(f)
    metadata = pd.DataFrame(data["sentences"])
    ids = metadata.video_id.apply(lambda x: int(x.replace("video", "")))
    start, end = MSR_VTT_SPLITS[split]
    metadata = metadata[(ids >= start) & (ids < end)][["video_id", "caption"]]
    if verbose:
        print(f"Total Data Count (MSR-VTT-{split}):", len(metadata))
    return metadata
