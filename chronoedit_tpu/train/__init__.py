from chronoedit_tpu.train.train_step import (
    TrainConfig,
    TrainState,
    make_train_state,
    make_train_step,
    edit_training_batch,
)
from chronoedit_tpu.train.ema import EMAConfig, ema_update, power_ema_beta

__all__ = [
    "TrainConfig",
    "TrainState",
    "make_train_state",
    "make_train_step",
    "edit_training_batch",
    "EMAConfig",
    "ema_update",
    "power_ema_beta",
]
