from cppf2_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_train_step,
    tuple_loss,
    make_lr_schedule,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "tuple_loss",
    "make_lr_schedule",
]
