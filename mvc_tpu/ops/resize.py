"""Image resize for the visual pipeline.

The reference decodes with cv2 and resizes with ``cv2.INTER_AREA``
(reference src/extract_features.py:86).  On device we use
``jax.image.resize`` with linear interpolation + antialiasing, which for
downsampling approximates area averaging (divergence documented in
PARITY.md; the host cv2 path remains available in extract.video_io for exact
reference behavior)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_frames(frames: jnp.ndarray, height: int = 299, width: int = 299) -> jnp.ndarray:
    """[N, H, W, C] -> [N, height, width, C], linear + antialias."""
    n, _, _, c = frames.shape
    return jax.image.resize(
        frames.astype(jnp.float32), (n, height, width, c), method="linear", antialias=True
    )
