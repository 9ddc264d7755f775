from .checkpoints import (
    CheckpointManager,
    checkpoint_exists,
    graft_subtree,
    restore_checkpoint,
    save_checkpoint,
)
from .logging_utils import CsvLogger, StepTimer
from .trainer import MultiSpeakerTrainer, TrainState, label_params, make_optimizer

__all__ = [
    "CheckpointManager",
    "checkpoint_exists",
    "graft_subtree",
    "restore_checkpoint",
    "save_checkpoint",
    "CsvLogger",
    "StepTimer",
    "MultiSpeakerTrainer",
    "TrainState",
    "label_params",
    "make_optimizer",
]
