"""Device-resident feature cache.

End-to-end training off-host is H2D-bound: every step re-transfers ~tens of
MB of per-frame features that never change across epochs (BENCH_NOTES.md —
400 samples/s through the tunnel vs 19.9k samples/s device compute).  MSVD
feature sets are small (~hundreds of MB), so for datasets that fit in HBM we
transfer every clip's features to the device ONCE and per step send only the
caption ids and per-sample row indices; the feature gather + frame-mask
construction happen on device inside the jitted train step.

The reference re-copies features to the GPU every batch
(reference src/train.py:188-192); this replaces that per-batch copy.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from mvc_tpu.data.dataset import load_clip_features


def quantize_int8(x: np.ndarray):
    """Per-(sample/clip, frame) max-abs int8 quantization over the feature
    axis -> (int8 payload, f32 scales).  The ONE implementation shared by the
    trainer's H2D transfer path and the device feature cache — the two must
    stay numerically identical.  All-zero frames get scale 1.0 (their values
    are exactly zero either way)."""
    scale = np.max(np.abs(x), axis=-1, keepdims=True) / 127.0
    scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
    q = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    return q, scale


class DeviceFeatureCache:
    """All unique clips' (audio, visual) features stacked to
    ``[N, T_top, D]`` device arrays plus per-clip frame counts.

    ``row_of`` maps video_id -> row index; ``arrays()`` returns the pytree to
    pass into a jitted step (pass as an argument — device-resident, so no
    transfer happens per call); ``gather_features`` reconstitutes the batch
    tensors on device.
    """

    def __init__(self, dataset, dtype: str = "bfloat16", mesh=None,
                 frame_buckets=None):
        import jax
        import jax.numpy as jnp

        video_ids = list(dataset.metadata["video_id"].unique())
        self.row_of: Dict[str, int] = {v: i for i, v in enumerate(video_ids)}

        feats = [
            load_clip_features(dataset.root_dir, vid, normalize=dataset.normalize,
                               video_only=dataset.video_only)
            for vid in video_ids
        ]
        lengths = np.array([a.shape[0] for a, _ in feats], dtype=np.int32)
        t_top = int(lengths.max()) if len(lengths) else 1
        # Stack up to the frame BUCKET covering t_top, not t_top itself: the
        # uncached collator pads to the bucket, and with the bug-compat
        # mask_padded_features=False those extra zero frames are attended —
        # the cached path must be able to serve the exact same tensors.
        from mvc_tpu.data.dataset import _bucket

        t_store = _bucket(t_top, frame_buckets) if frame_buckets else t_top
        a_dim = feats[0][0].shape[1]
        v_dim = feats[0][1].shape[1]
        audio = np.zeros((len(feats), t_store, a_dim), np.float32)
        visual = np.zeros((len(feats), t_store, v_dim), np.float32)
        for i, (a, v) in enumerate(feats):
            audio[i, : a.shape[0]] = a
            visual[i, : v.shape[0]] = v

        self.t_top = t_top
        self.t_store = t_store
        self.lengths_np = lengths
        np_dtype = np.dtype(jnp.dtype(dtype).name) if dtype else np.float32

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            put = lambda x: jax.device_put(x, repl)  # noqa: E731
        else:
            put = jax.device_put
        self._arrays = {"lengths": put(lengths)}
        if np_dtype == np.int8:
            # Same per-(clip, frame) max-abs quantization as the trainer's
            # int8 transfer path (trainer._put_batch): a raw astype would
            # truncate normalized features to {-1, 0, 1}.
            for name, x in (("audio", audio), ("visual", visual)):
                q, scale = quantize_int8(x)
                self._arrays[name] = put(q)
                self._arrays[name + "_scale"] = put(scale)
        else:
            self._arrays["audio"] = put(audio.astype(np_dtype))
            self._arrays["visual"] = put(visual.astype(np_dtype))

        # one-time caption encoding for the light per-item loader path
        self.caption_rows = np.array(
            [self.row_of[v] for v in dataset.metadata["video_id"]], dtype=np.int32
        )
        self.caption_ids = [
            np.asarray(dataset.vocab.encode_caption(c), dtype=np.int32)
            for c in dataset.metadata["caption"]
        ]

    def arrays(self):
        return self._arrays

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self._arrays.values())


def gather_features(cache_arrays, video_rows, t_pad: int, sample_mask=None):
    """On-device: rows -> (audio [B,t_pad,Da] f32, visual [B,t_pad,Dv] f32,
    feat_mask [B,t_pad] bool).  ``t_pad`` is static (bucketed host-side).
    ``sample_mask`` zeroes batch-padding rows so cached and uncached paths
    see bit-identical tensors (padding rows are all-zero in collate_av_batch)."""
    import jax.numpy as jnp

    audio = cache_arrays["audio"][video_rows, :t_pad].astype(jnp.float32)
    visual = cache_arrays["visual"][video_rows, :t_pad].astype(jnp.float32)
    if "audio_scale" in cache_arrays:      # int8 cache: dequantize on device
        audio = audio * cache_arrays["audio_scale"][video_rows, :t_pad]
        visual = visual * cache_arrays["visual_scale"][video_rows, :t_pad]
    lens = cache_arrays["lengths"][video_rows]
    feat_mask = jnp.arange(t_pad)[None, :] < lens[:, None]
    if sample_mask is not None:
        keep = sample_mask[:, None]
        feat_mask = feat_mask & keep
        audio = audio * keep[..., None]
        visual = visual * keep[..., None]
    return audio, visual, feat_mask


def collate_index_batch(
    rows: np.ndarray,
    caption_ids_list,
    lengths: np.ndarray,
    caption_buckets,
    frame_buckets,
    pad_batch_to: Optional[int] = None,
    t_store: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Host-side light collation: captions [L,B] + video_rows [B] +
    sample_mask [B] + the batch's static frame bucket (from cached
    lengths).  No feature bytes leave the host.  ``t_store`` is the cache's
    stacked frame capacity (DeviceFeatureCache.t_store); the frame bucket is
    clamped to it so the on-device gather slice stays in range — with a
    bucket-padded cache the clamp never bites and the cached path pads to
    the same bucket as the uncached collator."""
    from mvc_tpu.config import PAD_ID
    from mvc_tpu.data.dataset import _bucket

    n = len(rows)
    b = pad_batch_to or n
    l_max = max(c.shape[0] for c in caption_ids_list)
    l_pad = _bucket(l_max, caption_buckets)
    t_max = int(lengths[rows].max())
    t_pad = min(_bucket(t_max, frame_buckets),
                int(t_store) if t_store else int(lengths.max()))

    captions = np.full((l_pad, b), PAD_ID, dtype=np.int32)
    video_rows = np.zeros((b,), dtype=np.int32)
    sample_mask = np.zeros((b,), dtype=bool)
    for i, (row, cap) in enumerate(zip(rows, caption_ids_list)):
        captions[: cap.shape[0], i] = cap
        video_rows[i] = row
        sample_mask[i] = True
    return {
        "captions": captions,
        "video_rows": video_rows,
        "sample_mask": sample_mask,
        "t_pad": t_pad,
    }
