"""Host-side media decode.

Mirrors the reference's decode path (reference src/extract_features.py:32-106):
cv2 frame decode with BGR->RGB + INTER_AREA resize + fps stride sampling, and
a wav sidecar for audio (the reference exports ``videos/x.avi`` ->
``audios/x.wav`` via moviepy and silence-fills mute clips, :42-49).

This environment has no ffmpeg/moviepy, so audio resolution order is:
1. sibling ``audios/<name>.wav`` (the reference's own layout)
2. ``ffmpeg`` on PATH (or $MVC_FFMPEG) to demux on the fly
3. silence for the clip duration (the reference's mute-clip behavior)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

from mvc_tpu.ops.logmel import SAMPLE_RATE


def load_frames(
    filename: str,
    frame_size: Tuple[int, int] = (299, 299),
    fps: Optional[float] = 1,
) -> Tuple[np.ndarray, float]:
    """Decode a video into [N, H, W, 3] uint8 RGB frames downsampled to
    ``fps`` via stride indexing (reference src/extract_features.py:69-106).
    Returns (frames, duration_seconds)."""
    import cv2

    cap = cv2.VideoCapture(filename)
    frame_rate = float(np.round(cap.get(cv2.CAP_PROP_FPS))) or 25.0
    frames = []
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        frame = cv2.resize(frame, frame_size, interpolation=cv2.INTER_AREA)
        frames.append(frame)
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {filename}")
    frames = np.asarray(frames)
    total = frames.shape[0]
    duration = total / frame_rate

    take_n = 0
    if fps and fps < frame_rate:
        take_n = int(total // frame_rate * fps)
    if take_n > 0:
        idx = np.arange(0, total, total // take_n)
        frames = frames[idx]
    return frames, duration


def _read_wav(path: str) -> Tuple[np.ndarray, int]:
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    data = np.asarray(data)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    return data, sr


def _resample(wav: np.ndarray, sr: int, target: int = SAMPLE_RATE) -> np.ndarray:
    if sr == target:
        return wav
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr, target)
    return resample_poly(wav, target // g, sr // g).astype(np.float32)


def _ffmpeg_exe() -> Optional[str]:
    return os.environ.get("MVC_FFMPEG") or shutil.which("ffmpeg")


def _sidecar_wav(filename: str) -> str:
    """videos/<name>.<ext> -> audios/<name>.wav (the reference's layout,
    src/extract_features.py:38-39)."""
    _, ext = os.path.splitext(filename)
    return filename.replace(f"{os.sep}videos{os.sep}", f"{os.sep}audios{os.sep}").replace(ext, ".wav")


def load_audio(filename: str, duration_hint: Optional[float] = None) -> np.ndarray:
    """Mono float32 waveform at 16 kHz for a video file (resolution order in
    the module docstring)."""
    sidecar = _sidecar_wav(filename)
    if os.path.isfile(sidecar):
        wav, sr = _read_wav(sidecar)
        return _resample(wav, sr)

    ffmpeg = _ffmpeg_exe()
    if ffmpeg:
        with tempfile.TemporaryDirectory() as td:
            out = os.path.join(td, "audio.wav")
            proc = subprocess.run(
                [ffmpeg, "-v", "error", "-i", filename, "-ac", "1",
                 "-ar", str(SAMPLE_RATE), "-f", "wav", out],
                capture_output=True,
            )
            if proc.returncode == 0 and os.path.isfile(out):
                wav, sr = _read_wav(out)
                return _resample(wav, sr)

    # Mute clip -> silence for the clip duration (reference behavior).
    duration = duration_hint if duration_hint is not None else 1.0
    return np.zeros(int(SAMPLE_RATE * max(duration, 1.0)), dtype=np.float32)
