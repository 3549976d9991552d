"""Training stack: jitted/pjit steps, checkpointing, the Solver loop."""

from speechsplit_tpu.training.train_step import (
    TrainState,
    create_train_state,
    make_f0_train_step,
    make_train_step,
)
from speechsplit_tpu.training.solver import Solver

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_f0_train_step",
    "Solver",
]
