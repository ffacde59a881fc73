from mvc_tpu.ops.logmel import log_mel_examples, log_mel_spectrogram
from mvc_tpu.ops.resize import resize_frames

__all__ = ["log_mel_examples", "log_mel_spectrogram", "resize_frames"]
