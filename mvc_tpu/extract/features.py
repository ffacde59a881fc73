"""Batched on-device feature extraction — the clips/sec headline path.

The reference extracts one clip at a time: decode, run Inception on that
clip's frames, run VGGish on that clip's audio, save, repeat
(reference src/extract_features.py:140-161).  Here:

- host decode runs in a thread pool, overlapped with device compute
- frames/audio examples from MANY clips are flattened into one padded,
  bucketed batch and encoded by a single jitted program per bucket size —
  the MXU sees large batched convolutions instead of 4-frame dribbles
- outputs are split back per clip and saved with the reference's ``.npy``
  contract (``features/video/<id>.npy`` [T,2048], ``features/audio/<id>.npy``
  [N,128]) including skip-existing behavior (:153-156)
- with ``mesh=``, the flattened frame/example batch shards over every mesh
  device (extraction is embarrassingly clip-parallel — SURVEY §2.3); weights
  replicate and no collectives run in the encode programs
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mvc_tpu.ops.logmel import (
    log_mel_examples_batch,
    num_examples_for,
    samples_for,
)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


def _round_to_shards(n: int, shards: int) -> int:
    """Padded batch must divide the mesh for batch-axis sharding."""
    return ((n + shards - 1) // shards) * shards


class FeatureExtractor:
    """Batched Inception-v3 + VGGish extractor.

    Mirrors the reference's FeatureExtractor API (``extract(filename, fps,
    to_numpy)``, reference src/extract_features.py:18-30) and adds
    ``extract_batch`` for cross-clip batching.
    """

    def __init__(
        self,
        inception_params=None,
        vggish_params=None,
        fps: float = 1,
        frame_buckets: Sequence[int] = (64, 128, 256),
        audio_buckets: Sequence[int] = (8, 16, 32, 64),
        scale_to_unit: bool = False,
        decode_workers: Optional[int] = None,
        seed: int = 0,
        visual_model: str = "inception_v3",
        mesh=None,
    ):
        # cv2 decode scales with real cores; oversubscribing one core is a
        # slowdown (this container has a single CPU)
        if decode_workers is None:
            decode_workers = min(8, os.cpu_count() or 1)
        import jax

        from mvc_tpu.models import inception_v3 as iv3
        from mvc_tpu.models import vggish as vg

        # ``visual_model`` mirrors the reference VisualEncoder's ``model``
        # switch (reference src/models/visual_encoder.py:23-30): "resnet" is
        # ResNet-101 at 224x224 whose fc is kept (1000-d logit "features" —
        # PARITY.md); default Inception-v3 at 299x299 -> 2048-d pooled.
        if visual_model == "resnet":
            from mvc_tpu.models import resnet as rn

            if inception_params is None:
                inception_params = rn.init_resnet101(jax.random.PRNGKey(seed))
            self.frame_size = (224, 224)
            visual_features = rn.resnet101_features
        elif visual_model == "inception_v3":
            if inception_params is None:
                inception_params = iv3.init_inception_v3(jax.random.PRNGKey(seed))
            self.frame_size = (299, 299)
            visual_features = iv3.inception_v3_features
        else:
            raise ValueError(f"unknown visual_model {visual_model!r}")
        if vggish_params is None:
            vggish_params = vg.init_vggish(jax.random.PRNGKey(seed + 1))
        self.visual_model = visual_model
        self.inception_params = inception_params
        self.vggish_params = vggish_params
        self.fps = fps
        self.frame_buckets = tuple(frame_buckets)
        self.audio_buckets = tuple(audio_buckets)
        self.scale_to_unit = scale_to_unit
        self.decode_workers = decode_workers

        def encode_frames(params, frames_u8):
            x = iv3.imagenet_normalize(frames_u8, scale_to_unit=self.scale_to_unit)
            return visual_features(params, x)

        def encode_audio(params, examples):
            return vg.vggish_embeddings(params, examples)

        # Extraction is embarrassingly clip-parallel (SURVEY §2.3): with a
        # mesh, the flattened frame/example batch shards over EVERY mesh
        # device (dp AND tp axes — encoding has no vocab axis to tp-shard,
        # so both axes carry batch) and weights replicate; XLA runs each
        # shard's convolutions locally with no collectives.  Buckets are
        # rounded up to the device count in the encode helpers.
        self.mesh = mesh
        self._n_shards = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._n_shards = int(np.prod(list(mesh.shape.values())))
            self._batch_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
            self._replicated = NamedSharding(mesh, P())
            self.inception_params = jax.device_put(self.inception_params, self._replicated)
            self.vggish_params = jax.device_put(self.vggish_params, self._replicated)
            self._encode_frames = jax.jit(
                encode_frames, in_shardings=(self._replicated, self._batch_sharding)
            )
            self._encode_audio = jax.jit(
                encode_audio, in_shardings=(self._replicated, self._batch_sharding)
            )
        else:
            self._encode_frames = jax.jit(encode_frames)
            self._encode_audio = jax.jit(encode_audio)

    # ------------------------------------------------------------ decode
    def _decode_one(self, filename: str, fps: Optional[float] = None):
        from mvc_tpu.extract.video_io import load_audio, load_frames

        frames, duration = load_frames(
            filename, frame_size=self.frame_size, fps=self.fps if fps is None else fps
        )
        wav = load_audio(filename, duration_hint=duration)
        return frames, wav

    # ------------------------------------------------------------ encode
    def _encode_frame_stack(self, all_frames: np.ndarray) -> np.ndarray:
        """[M, H, W, 3] uint8 -> [M, D] visual features, padded to a bucket
        (inception_v3: 299px -> 2048-d; resnet: 224px -> 1000-d logits)."""
        m = all_frames.shape[0]
        target = _round_to_shards(_bucket(m, self.frame_buckets), self._n_shards)
        if target != m:
            all_frames = np.concatenate(
                [all_frames, np.zeros((target - m, *all_frames.shape[1:]), all_frames.dtype)]
            )
        # numpy in: under a mesh, jit's in_shardings places each batch shard
        # on its device directly (committed single-device arrays would not).
        out = np.asarray(self._encode_frames(self.inception_params, all_frames))
        return out[:m]

    def _encode_audio_stack(self, examples: np.ndarray) -> np.ndarray:
        """[M, 96, 64] -> [M, 128], padded to a bucket."""
        m = examples.shape[0]
        if m == 0:
            return np.zeros((0, 128), np.float32)
        target = _round_to_shards(_bucket(m, self.audio_buckets), self._n_shards)
        if target != m:
            examples = np.concatenate(
                [examples, np.zeros((target - m, *examples.shape[1:]), examples.dtype)]
            )
        out = np.asarray(self._encode_audio(self.vggish_params, examples))
        return out[:m]

    # ------------------------------------------------------------ public
    def extract(self, filename: str, fps: Optional[float] = None, to_numpy: bool = True):
        """Single-clip extraction (reference API, src/extract_features.py:25-30;
        the per-call ``fps`` overrides the constructor default exactly as the
        reference's does).  Returns (video_f [T,2048], audio_f [N,128])."""
        result = self.extract_batch([filename], fps=fps)[0]
        return result

    def extract_batch(
        self, filenames: Sequence[str], fps: Optional[float] = None
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Extract many clips with one (or few) device program launches.
        Returns [(video_features, audio_features)] in input order.  fps only
        changes host-side frame sampling; device programs are bucketed by
        frame count, so no recompile is triggered."""
        if self.decode_workers > 1:
            with ThreadPoolExecutor(max_workers=self.decode_workers) as pool:
                decoded = list(pool.map(lambda f: self._decode_one(f, fps), filenames))
        else:
            decoded = [self._decode_one(f, fps) for f in filenames]
        return self._encode_decoded(decoded)

    def _encode_decoded(self, decoded) -> List[Tuple[np.ndarray, np.ndarray]]:
        import jax.numpy as jnp

        # ---- visual: flatten frames across clips
        frame_counts = [d[0].shape[0] for d in decoded]
        all_frames = np.concatenate([d[0] for d in decoded], axis=0)
        feats = self._encode_frame_stack(all_frames)
        video_out = []
        ofs = 0
        for c in frame_counts:
            video_out.append(feats[ofs : ofs + c])
            ofs += c

        # ---- audio: ONE batched log-mel dispatch over padded waveforms
        ex_counts = [max(num_examples_for(w.shape[0]), 1) for _, w in decoded]
        max_ex = max(ex_counts)
        wav_len = samples_for(max_ex)
        wavs = np.zeros((len(decoded), wav_len), np.float32)
        for i, (_, w) in enumerate(decoded):
            n = min(w.shape[0], wav_len)
            wavs[i, :n] = w[:n]
        examples = np.asarray(log_mel_examples_batch(jnp.asarray(wavs), max_ex))
        all_examples = np.concatenate(
            [examples[i, :c] for i, c in enumerate(ex_counts)], axis=0
        )
        embs = self._encode_audio_stack(all_examples)
        audio_out = []
        ofs = 0
        for c in ex_counts:
            audio_out.append(embs[ofs : ofs + c])
            ofs += c

        return list(zip(video_out, audio_out))

    def extract_dataset(
        self,
        videos_dir: str,
        features_dir: str,
        batch_size: int = 16,
        skip_existing: bool = True,
        verbose: bool = True,
    ) -> Dict[str, int]:
        """Directory sweep with the reference's skip-existing contract
        (reference src/extract_features.py:140-161), batched across clips."""
        video_feat_dir = os.path.join(features_dir, "video")
        audio_feat_dir = os.path.join(features_dir, "audio")
        os.makedirs(video_feat_dir, exist_ok=True)
        os.makedirs(audio_feat_dir, exist_ok=True)

        todo = []
        skipped = 0
        for f in sorted(os.listdir(videos_dir)):
            name, _ = os.path.splitext(f)
            vpath = os.path.join(video_feat_dir, f"{name}.npy")
            apath = os.path.join(audio_feat_dir, f"{name}.npy")
            if skip_existing and os.path.isfile(vpath) and os.path.isfile(apath):
                skipped += 1
                continue
            todo.append((os.path.join(videos_dir, f), name))

        failures = []
        done = 0
        chunks = [todo[i : i + batch_size] for i in range(0, len(todo), batch_size)]

        # Host-decode vs device-encode wall split (the stages overlap via the
        # pipeline below, so the two sums can exceed total wall; each sum is
        # that stage's busy time and the larger one is the bound).
        times = {"decode_s": 0.0, "encode_s": 0.0}

        def decode_chunk(chunk):
            """Per-clip decode with failure isolation."""
            t0 = time.perf_counter()
            out = []
            for path, name in chunk:
                try:
                    out.append((name, self._decode_one(path)))
                except Exception as e:
                    failures.append((path, str(e)))
            times["decode_s"] += time.perf_counter() - t0
            return out

        # Pipeline: decode chunk i+1 on a host thread while chunk i encodes on
        # the device.
        stager = ThreadPoolExecutor(max_workers=1)
        try:
            fut = stager.submit(decode_chunk, chunks[0]) if chunks else None
            for i in range(len(chunks)):
                decoded_named = fut.result()
                fut = (
                    stager.submit(decode_chunk, chunks[i + 1])
                    if i + 1 < len(chunks) else None
                )
                if not decoded_named:
                    continue
                t0 = time.perf_counter()
                names = [n for n, _ in decoded_named]
                results = self._encode_decoded([d for _, d in decoded_named])
                for name, (video_f, audio_f) in zip(names, results):
                    np.save(os.path.join(video_feat_dir, name), video_f)
                    np.save(os.path.join(audio_feat_dir, name), audio_f)
                    done += 1
                times["encode_s"] += time.perf_counter() - t0
                if verbose:
                    print(f"extracted {done}/{len(todo)} (skipped {skipped}, failures {len(failures)})")
        finally:
            stager.shutdown(wait=False)
        if failures and verbose:
            print("failures:", failures)
        return {"done": done, "skipped": skipped, "failures": len(failures),
                "decode_s": round(times["decode_s"], 3),
                "encode_s": round(times["encode_s"], 3)}
