from chexpert_tpu.train.loss import bce_with_logits, train_loss
from chexpert_tpu.train.optim import make_optimizer, make_schedule
from chexpert_tpu.train.state import TrainState, init_model
from chexpert_tpu.train.steps import jit_steps, make_eval_step, make_train_step

__all__ = [
    "bce_with_logits",
    "train_loss",
    "make_optimizer",
    "make_schedule",
    "TrainState",
    "init_model",
    "jit_steps",
    "make_eval_step",
    "make_train_step",
]
