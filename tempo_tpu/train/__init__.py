from tempo_tpu.train.state import TrainState, create_train_state, make_optimizer
from tempo_tpu.train.step import make_train_step, make_eval_step
from tempo_tpu.train.trainer import Trainer

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "Trainer",
]
