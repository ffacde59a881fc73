"""Multi-host dataset sharding and length-bucketed batching in the loader."""

import numpy as np

from mvc_tpu.data import VideoCaptioningDataset
from mvc_tpu.data.loader import DataLoader


def _ds(synthetic_msvd):
    return VideoCaptioningDataset(
        str(synthetic_msvd), split="train",
        vocab_path=str(synthetic_msvd / "metadata" / "vocab.json"), verbose=False,
    )


def test_process_sharding_disjoint_and_complete(synthetic_msvd):
    ds = _ds(synthetic_msvd)
    n_proc = 3
    seen = []
    for p in range(n_proc):
        loader = DataLoader(ds, batch_size=4, shuffle=False, prefetch=0,
                            process_index=p, process_count=n_proc,
                            frame_buckets=(8,), caption_buckets=(12,),
                            pad_partial_batches=False)
        for batch in loader:
            # recover identity via caption contents is awkward; count instead
            seen.append(int(batch["sample_mask"].sum()))
    assert sum(seen) == len(ds)
    # per-process loaders cover disjoint strided slices
    idx = [set(range(p, len(ds), n_proc)) for p in range(n_proc)]
    assert set.union(*idx) == set(range(len(ds)))
    assert all(idx[a].isdisjoint(idx[b]) for a in range(n_proc) for b in range(a + 1, n_proc))


def test_bucket_by_length_groups_similar(synthetic_msvd):
    ds = _ds(synthetic_msvd)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=1, prefetch=0,
                        bucket_by_length=True,
                        frame_buckets=(2, 4, 6, 8), caption_buckets=(12,))
    plain = DataLoader(ds, batch_size=4, shuffle=True, seed=1, prefetch=0,
                       bucket_by_length=False,
                       frame_buckets=(2, 4, 6, 8), caption_buckets=(12,))

    def padded_frames(l):
        return sum(b["audio"].shape[0] * b["audio"].shape[1] for b in l)

    # bucketing never increases total padded frame slots
    assert padded_frames(loader) <= padded_frames(plain)
    # all samples still covered
    total = sum(int(b["sample_mask"].sum()) for b in DataLoader(
        ds, batch_size=4, shuffle=True, seed=2, prefetch=0, bucket_by_length=True,
        frame_buckets=(2, 4, 6, 8), caption_buckets=(12,)))
    assert total == len(ds)
