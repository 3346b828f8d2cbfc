from cppf2_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_train_step,
    tuple_loss,
    make_lr_schedule,
)
from cppf2_tpu.train.visual import (
    create_visual_train_state,
    make_visual_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "tuple_loss",
    "make_lr_schedule",
    "create_visual_train_state",
    "make_visual_train_step",
]
