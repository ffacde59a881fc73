from mvc_tpu.utils.checkpoint_convert import convert_reference_checkpoint

__all__ = ["convert_reference_checkpoint"]
