"""VGGish log-mel frontend in JAX.

Replaces the torchvggish hub model's numpy preprocessing
(reference src/models/audio_encoder.py:13,18-30 loads
harritaylor/torchvggish, whose frontend implements the AudioSet VGGish input
spec) with a jitted XLA graph:

- mono waveform at 16 kHz
- STFT: 25 ms (400-sample) periodic-Hann windows, 10 ms (160) hop, magnitude
- 64 mel bands spanning 125–7500 Hz (HTK mel scale), spectrogram-bin matmul
- log(mel + 0.01)
- framed into 0.96 s examples: 96 frames x 64 bands, example hop 0.96 s

Everything static-shape: the waveform is padded/truncated to a fixed number
of examples per clip so the whole frontend + CNN fuses into one program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
STFT_WINDOW = 400          # 25 ms
STFT_HOP = 160             # 10 ms
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_FRAMES = 96        # 0.96 s of 10 ms frames
FFT_LENGTH = 512           # next pow2 >= window


def _hz_to_mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


def mel_filterbank(
    num_mel: int = NUM_MEL_BINS,
    num_spectrogram_bins: int = FFT_LENGTH // 2 + 1,
    sample_rate: int = SAMPLE_RATE,
    lower_hz: float = MEL_MIN_HZ,
    upper_hz: float = MEL_MAX_HZ,
) -> np.ndarray:
    """[num_spectrogram_bins, num_mel] triangular HTK-mel weight matrix (the
    AudioSet/VGGish construction: triangles linear in mel space, bin 0 zeroed)."""
    nyquist = sample_rate / 2.0
    spec_hz = np.linspace(0.0, nyquist, num_spectrogram_bins)
    spec_mel = _hz_to_mel(spec_hz)
    band_edges = np.linspace(_hz_to_mel(lower_hz), _hz_to_mel(upper_hz), num_mel + 2)
    weights = np.zeros((num_spectrogram_bins, num_mel))
    for i in range(num_mel):
        lower, center, upper = band_edges[i : i + 3]
        lower_slope = (spec_mel - lower) / (center - lower)
        upper_slope = (upper - spec_mel) / (upper - center)
        weights[:, i] = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    weights[0, :] = 0.0   # DC bin excluded
    return weights.astype(np.float32)


def _frame(x: jnp.ndarray, window: int, hop: int) -> jnp.ndarray:
    """1-D signal -> [n_frames, window] strided frames (static shapes)."""
    n = (x.shape[0] - window) // hop + 1
    idx = jnp.arange(window)[None, :] + hop * jnp.arange(n)[:, None]
    return x[idx]


@partial(jax.jit, static_argnames=("window", "hop", "fft_length"))
def stft_magnitude(x, window: int = STFT_WINDOW, hop: int = STFT_HOP, fft_length: int = FFT_LENGTH):
    frames = _frame(x, window, hop)
    win = jnp.asarray(0.5 - 0.5 * np.cos(2 * np.pi * np.arange(window) / window), x.dtype)
    return jnp.abs(jnp.fft.rfft(frames * win, n=fft_length, axis=-1))


def log_mel_spectrogram(waveform: jnp.ndarray) -> jnp.ndarray:
    """[n_samples] @16kHz -> [n_frames, 64] log-mel."""
    mag = stft_magnitude(waveform)
    mel = mag @ jnp.asarray(mel_filterbank())
    return jnp.log(mel + LOG_OFFSET)


def log_mel_examples(waveform: jnp.ndarray, num_examples: int) -> jnp.ndarray:
    """[n_samples] -> [num_examples, 96, 64]: fixed-count 0.96 s examples.
    The waveform is zero-padded / truncated to exactly cover ``num_examples``
    (static shapes for XLA; callers mask by true length)."""
    needed = (num_examples * EXAMPLE_FRAMES - 1) * STFT_HOP + STFT_WINDOW
    wav = jnp.zeros((needed,), waveform.dtype).at[: min(waveform.shape[0], needed)].set(
        waveform[:needed]
    )
    logmel = log_mel_spectrogram(wav)                       # [N*96(+pad), 64]
    frames = logmel[: num_examples * EXAMPLE_FRAMES]
    return frames.reshape(num_examples, EXAMPLE_FRAMES, NUM_MEL_BINS)


@partial(jax.jit, static_argnames=("num_examples",))
def log_mel_examples_batch(waveforms: jnp.ndarray, num_examples: int) -> jnp.ndarray:
    """[N, S] padded waveforms -> [N, num_examples, 96, 64] in ONE dispatch
    (per-clip dispatch round trips dominate off-host otherwise)."""
    return jax.vmap(lambda w: log_mel_examples(w, num_examples))(waveforms)


def samples_for(num_examples: int) -> int:
    """Waveform samples consumed by ``num_examples`` whole examples."""
    return (num_examples * EXAMPLE_FRAMES - 1) * STFT_HOP + STFT_WINDOW


def num_examples_for(n_samples: int) -> int:
    """How many whole 0.96 s examples a waveform yields (VGGish framing)."""
    window = EXAMPLE_FRAMES * STFT_HOP - STFT_HOP + STFT_WINDOW
    length_secs = n_samples / SAMPLE_RATE
    if n_samples < window:
        return 0
    n_frames = (n_samples - STFT_WINDOW) // STFT_HOP + 1
    return n_frames // EXAMPLE_FRAMES
