"""Recognition training: losses, metrics, data-parallel trainer."""

from pram_tpu.train.losses import (
    seg_loss_weighted,
    seg_accuracy,
    seg_iou_precision,
)
from pram_tpu.train.trainer import TrainConfig, TrainState, Trainer, make_train_step

__all__ = [
    "seg_loss_weighted",
    "seg_accuracy",
    "seg_iou_precision",
    "TrainConfig",
    "TrainState",
    "Trainer",
    "make_train_step",
]
