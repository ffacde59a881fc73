from mvc_tpu.models.captioning import AVCaptioning, AVCaptioningDual
from mvc_tpu.models.transformer import TransformerCaptioning

__all__ = ["AVCaptioning", "AVCaptioningDual", "TransformerCaptioning"]
