from mvc_tpu.training.losses import (
    entropy_loss,
    global_reconstruction_loss,
    local_reconstruction_loss,
    modality_wise_reconstruction_loss,
    total_reconstruction_loss,
    ModalityWiseReconstructionLossBuilder,
)

from mvc_tpu.training.optimizer import PlateauScheduler, make_optimizer
from mvc_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from mvc_tpu.training.trainer import Trainer

__all__ = [
    "PlateauScheduler",
    "make_optimizer",
    "load_checkpoint",
    "save_checkpoint",
    "Trainer",
    "entropy_loss",
    "global_reconstruction_loss",
    "local_reconstruction_loss",
    "modality_wise_reconstruction_loss",
    "total_reconstruction_loss",
    "ModalityWiseReconstructionLossBuilder",
]
