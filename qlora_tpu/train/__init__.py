"""Training engine: loss, optimizers, jit train step, collator, data, loop."""

from .loss import IGNORE_INDEX, masked_cross_entropy
from .optimizer import (
    adamw, adam8bit, host_offload, make_optimizer, warmup_constant_schedule,
)
from .step import TrainState, init_train_state, make_eval_step, make_train_step

__all__ = [
    "IGNORE_INDEX", "masked_cross_entropy",
    "adamw", "adam8bit", "host_offload", "make_optimizer",
    "warmup_constant_schedule",
    "TrainState", "init_train_state", "make_eval_step", "make_train_step",
]
