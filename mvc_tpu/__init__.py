"""mvc_tpu — TPU-native multimodal video captioning framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
hmartelb/multimodal-video-captioning (RecNet-style SoftAttention-LSTM
captioning on MSVD and MSR-VTT), designed TPU-first:

- static-shape, `lax.scan`-based attention-LSTM decoders (vs. the reference's
  per-token Python loops, reference src/models/features_captioning.py:91-119)
- fully batched, jit-compiled beam search (vs. Python-list beams,
  reference src/models/features_captioning.py:131-228)
- data/tensor-parallel training over a `jax.sharding.Mesh`
- on-device feature extraction (Inception-v3 + VGGish log-mel) as a fused
  jitted graph (vs. one-clip-at-a-time, reference src/extract_features.py)
- a native metrics engine (BLEU / ROUGE-L / CIDEr / METEOR) with score parity
  against the vendored pycocoevalcap of the reference.
"""

__version__ = "0.1.0"

from mvc_tpu import config  # noqa: F401
