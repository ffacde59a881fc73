from mvc_tpu.models.captioning import AVCaptioning, AVCaptioningDual

__all__ = ["AVCaptioning", "AVCaptioningDual"]
