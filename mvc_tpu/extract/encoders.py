"""Encoder facades mirroring the reference's VisualEncoder / AudioEncoder
module API (reference src/models/visual_encoder.py:7-58,
src/models/audio_encoder.py:5-30), backed by the JAX implementations."""

from __future__ import annotations

from typing import Optional

import numpy as np


class VisualEncoder:
    """Per-frame CNN embedding: frames -> [N, D] (or [B, T, D] for stacked
    5-D input, like the reference's frame-stacking path).  ``model`` mirrors
    the reference's switch (src/models/visual_encoder.py:23-30):
    "inception_v3" -> 2048-d pooled features at 299px; "resnet" ->
    ResNet-101 at 224px whose fc is KEPT, i.e. 1000-d logits (PARITY.md)."""

    def __init__(self, model: str = "inception_v3", normalize: bool = True,
                 trainable: bool = False, params=None, scale_to_unit: bool = False):
        import jax

        from mvc_tpu.models import inception_v3 as iv3

        del trainable  # inference-only, like the reference with trainable=False
        self.normalize = normalize
        self.scale_to_unit = scale_to_unit
        if model == "resnet":
            from mvc_tpu.models import resnet as rn

            self.params = params if params is not None else rn.init_resnet101(jax.random.PRNGKey(0))
            self.input_size = (224, 224)
            features = rn.resnet101_features
        elif model == "inception_v3":
            self.params = params if params is not None else iv3.init_inception_v3(jax.random.PRNGKey(0))
            self.input_size = (299, 299)
            features = iv3.inception_v3_features
        else:
            raise AssertionError(f"unsupported visual encoder {model}")

        def forward(p, frames):
            x = frames
            if self.normalize:
                x = iv3.imagenet_normalize(x, scale_to_unit=self.scale_to_unit)
            return features(p, x)

        self._forward = jax.jit(forward)

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        """frames: [N, H, W, 3] or [B, T, H, W, 3] (NHWC)."""
        import jax.numpy as jnp

        frames = np.asarray(frames, np.float32)
        stacked = frames.ndim == 5
        shape = frames.shape
        if stacked:
            frames = frames.reshape(-1, *shape[2:])
        feats = np.asarray(self._forward(self.params, jnp.asarray(frames)))
        if stacked:
            feats = feats.reshape(shape[0], shape[1], -1)
        return feats


class AudioEncoder:
    """VGGish embedding: waveform -> [N, 128] (one row per 0.96 s)."""

    def __init__(self, model: str = "vggish", trainable: bool = False, params=None):
        import jax

        from mvc_tpu.models import vggish as vg

        assert model == "vggish", f"unsupported audio encoder {model}"
        del trainable
        self.params = params if params is not None else vg.init_vggish(jax.random.PRNGKey(1))
        self._embed = jax.jit(vg.vggish_embeddings)

    def from_tensor(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """audio: [C, N] channels-first (the reference's from_tensor contract,
        src/models/audio_encoder.py:26-30) or [N]."""
        import jax.numpy as jnp

        from mvc_tpu.extract.video_io import _resample
        from mvc_tpu.ops.logmel import log_mel_examples, num_examples_for

        audio = np.asarray(audio, np.float32)
        if audio.ndim == 2:
            audio = audio.mean(axis=0)
        audio = _resample(audio, sr)
        n = max(num_examples_for(audio.shape[0]), 1)
        examples = log_mel_examples(jnp.asarray(audio), n)
        return np.asarray(self._embed(self.params, examples))

    def __call__(self, audio: np.ndarray, sr: int = 16000) -> np.ndarray:
        return self.from_tensor(np.atleast_2d(audio), sr)
