"""Configuration tree for the framework.

Dataclass equivalents of the reference's config-as-code dicts, with identical
default values:

- DecoderConfig       <- DECODER_CONFIG / VISUAL_DECODER_CONFIG / AUDIO_DECODER_CONFIG
                         (reference src/models/captioning.py:7-55)
- ReconstructorConfig <- RECONSTRUCTOR_CONFIG (reference src/models/captioning.py:19-28)
- TrainerConfig       <- TrainerConfig (reference src/train.py:16-32)
- ExperimentConfig    <- the experiment dicts (reference src/train.py:377-467)

Additions over the reference (TPU-specific, documented in PARITY.md):
- dtype / param_dtype control (bf16 compute on the MXU)
- static-shape bucketing ladders for frames (T) and caption length (L)
- mesh axes for data / tensor parallelism
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

# Special token ids — identical to the reference Vocabulary
# (reference src/get_loader.py:25-26).
PAD_ID = 0
SOS_ID = 1
EOS_ID = 2
UNK_ID = 3

AUDIO_FEATURE_DIM = 128    # VGGish embedding size (reference src/models/audio_encoder.py)
VISUAL_FEATURE_DIM = 2048  # Inception-v3 pool features (reference src/models/visual_encoder.py:28-29)


@dataclass(frozen=True)
class DecoderConfig:
    """SoftAttention-LSTM caption decoder configuration.

    Defaults mirror DECODER_CONFIG (reference src/models/captioning.py:7-17).
    """

    rnn_type: str = "LSTM"            # "LSTM" | "GRU"
    rnn_num_layers: int = 1
    rnn_hidden_size: int = 512
    rnn_dropout: float = 0.0
    in_feature_size: int = VISUAL_FEATURE_DIM + AUDIO_FEATURE_DIM
    embedding_size: int = 300
    attn_size: int = 256
    output_size: int = 1024           # vocab size; overwritten by the model builder

    def replace(self, **kw) -> "DecoderConfig":
        return dataclasses.replace(self, **kw)


# The dual model's per-modality decoder configs
# (reference src/models/captioning.py:33-55).
VISUAL_DECODER_CONFIG = DecoderConfig(in_feature_size=VISUAL_FEATURE_DIM)
AUDIO_DECODER_CONFIG = DecoderConfig(in_feature_size=AUDIO_FEATURE_DIM, output_size=512)
SINGLE_DECODER_CONFIG = DecoderConfig()


@dataclass(frozen=True)
class ReconstructorConfig:
    """RecNet reconstructor configuration.

    Defaults mirror RECONSTRUCTOR_CONFIG (reference src/models/captioning.py:19-28).
    `hidden_size` (= reconstructed feature dim) and `decoder_size` (= decoder
    hidden size) are overwritten by the model builder exactly like the
    reference does (reference src/models/captioning.py:72-75).
    """

    type: str = "global"              # "none" | "global" | "local"
    rnn_type: str = "LSTM"
    rnn_num_layers: int = 1
    hidden_size: int = VISUAL_FEATURE_DIM + AUDIO_FEATURE_DIM
    rnn_dropout: float = 0.5
    decoder_size: int = 512
    attn_size: int = 256              # only used by the local reconstructor

    def replace(self, **kw) -> "ReconstructorConfig":
        return dataclasses.replace(self, **kw)


@dataclass
class TrainerConfig:
    """Training hyperparameters (reference src/train.py:16-32, 86-96)."""

    batch_size: int = 128
    epochs: int = 50
    lr: float = 1e-4
    weight_decay: float = 1e-5         # L2 into the gradient, torch-Adam style
    amsgrad: bool = True
    gradient_clip_value: float = 5.0   # element-wise value clip

    # ReduceLROnPlateau (reference src/train.py:89-96) — stepped on val CIDEr.
    lr_decay_gamma: float = 0.5
    lr_decay_patience: int = 5
    min_lr: float = 1e-7
    # The reference uses mode="min" on CIDEr (higher-is-better), which decays
    # the LR on every *improvement* (reference src/train.py:89-96,153).  We
    # default to the sane "max"; set "min" to reproduce the quirk (PARITY.md).
    plateau_mode: str = "max"

    # Loss weights (reference src/train.py:30-32; experiment dicts use
    # reg_lambda=0.0005, recon lambdas 0.5 / 0.00005 — src/train.py:407-467).
    reg_lambda: float = 0.001
    audio_recon_lambda: float = 10.0
    visual_recon_lambda: float = 10.0
    # Entropy-regularizer bug-compat: the reference softmaxes over the batch
    # axis (src/losses.py:13, PARITY.md #1).  False = sane vocab axis.
    compat_batch_axis_entropy: bool = False

    # --- TPU additions ---
    seed: int = 0
    compute_dtype: str = "float32"     # "float32" | "bfloat16"
    # Cast features to this dtype on the host before the H2D copy — halves
    # transfer bytes (the dominant cost off-host); None keeps float32.
    transfer_dtype: Optional[str] = "bfloat16"
    # Device-put the next batch on a background thread while the current step
    # runs (overlaps H2D with compute).
    device_prefetch: bool = True
    # Keep every unique clip's features resident in HBM (stored in
    # transfer_dtype) and send only caption ids + row indices per step —
    # removes the dominant off-host H2D cost for datasets that fit (MSVD
    # features are ~100s of MB).  See mvc_tpu/data/feature_cache.py.
    device_feature_cache: bool = False
    # Static-shape bucketing ladders (frames T, caption length L).  A batch is
    # padded up to the smallest bucket that fits; caps bound XLA recompiles.
    frame_buckets: Sequence[int] = (8, 16, 32, 48, 64)
    caption_buckets: Sequence[int] = (12, 16, 20, 26, 34)
    # Fused chunked-vocab CE + entropy (training/fused_loss.py): the train
    # step computes the loss from decoder hiddens in vocab tiles and never
    # materializes the [L, B, V] log-prob stacks (forward or backward).
    # Same math to float precision; auto-falls-back when unsupported
    # (compat_batch_axis_entropy, tp>1 vocab sharding, transformer family).
    fused_loss: bool = True
    # OPT-IN, NON-PARITY (PARITY.md): store the Adam moment trees (mu, nu,
    # nu_max) in this dtype — "bfloat16" halves the train step's largest
    # optimizer stream (3 full param-sized f32 trees) for ~0.4% relative
    # moment rounding; None keeps exact torch-Adam f32 state.
    adam_state_dtype: Optional[str] = None
    # Mask attention over padded frames.  The reference attends to zero-padded
    # frames (no mask — src/models/temporal_attention.py is called without
    # masks from the decoder); masking is strictly saner and makes results
    # independent of batch composition.  Set False for bug-compat (PARITY.md).
    mask_padded_features: bool = True

    # Optional METEOR synonym table (one whitespace-separated synonym group
    # per line) enabling the meteor-1.5 stage-3 matcher (weight 0.8).  The
    # reference's WordNet/paraphrase data is non-redistributable (PARITY.md).
    meteor_synonyms: Optional[str] = None
    # Optional METEOR stage-4 paraphrase table (one pair per line,
    # "phrase one ||| phrase two") and en-task function-word list (one word
    # per line, enabling delta=0.75 content/function weighting) — the same
    # user-supplied-data design as the synonym stage (evalcap/meteor.py).
    meteor_paraphrases: Optional[str] = None
    meteor_function_words: Optional[str] = None

    eval_max_caption_len: int = 30     # reference src/train.py:324
    eval_mode: str = "direct"          # "direct" (reference fit-time) | "beam"
    eval_beam_width: int = 5
    eval_beam_alpha: float = 0.0


@dataclass
class MeshConfig:
    """Device-mesh layout for pjit sharding.

    The reference has no distributed layer at all (SURVEY.md §2.3); this is
    the framework's comms layer — XLA collectives over ICI/DCN.
    """

    dp: int = -1        # data-parallel axis size; -1 = all remaining devices
    tp: int = 1         # tensor-parallel axis (vocab/hidden sharding)
    sp: int = 1         # sequence-parallel axis (frame axis T sharding)

    @property
    def axis_names(self) -> Tuple[str, ...]:
        """Axis names of the mesh ``mesh_from_config`` builds for this config
        (derived — sp adds a third axis only when > 1)."""
        return ("dp", "tp", "sp") if self.sp > 1 else ("dp", "tp")


@dataclass
class ModelConfig:
    """Top-level model selection, mirroring AVCaptioning[Dual] constructor args
    (reference src/models/captioning.py:58-66,147-156)."""

    dual: bool = True                   # reference src/train.py:375
    teacher_forcing_ratio: float = 1.0
    reconstructor_type: str = "none"    # "none" | "global" | "local"
    vocab_size: int = 1024              # overwritten once the vocab is built
    max_frames: int = 64
    max_caption_len: int = 34


@dataclass
class ExperimentConfig:
    """One experiment — the reference's experiment dicts
    (reference src/train.py:377-467)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainerConfig = field(default_factory=TrainerConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    checkpoint_name: str = "SA-LSTM"
    log_dir: str = "logs"
    video_only: bool = False
