from .checkpoints import (
    CheckpointManager,
    average_checkpoints,
    checkpoint_exists,
    graft_subtree,
    restore_checkpoint,
    save_checkpoint,
)
from .logging_utils import CsvLogger, StepTimer, TensorBoardLogger
from .trainer import MultiSpeakerTrainer, TrainState, label_params, make_optimizer

__all__ = [
    "CheckpointManager",
    "average_checkpoints",
    "checkpoint_exists",
    "graft_subtree",
    "restore_checkpoint",
    "save_checkpoint",
    "CsvLogger",
    "StepTimer",
    "TensorBoardLogger",
    "MultiSpeakerTrainer",
    "TrainState",
    "label_params",
    "make_optimizer",
]
