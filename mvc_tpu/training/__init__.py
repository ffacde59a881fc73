from mvc_tpu.training.losses import (
    entropy_loss,
    global_reconstruction_loss,
    local_reconstruction_loss,
    modality_wise_reconstruction_loss,
    total_reconstruction_loss,
    ModalityWiseReconstructionLossBuilder,
)

__all__ = [
    "entropy_loss",
    "global_reconstruction_loss",
    "local_reconstruction_loss",
    "modality_wise_reconstruction_loss",
    "total_reconstruction_loss",
    "ModalityWiseReconstructionLossBuilder",
]
