from chexpert_tpu.checkpoint.store import (
    load_model_checkpoint,
    load_optim_checkpoint,
    save_model_checkpoint,
    save_optim_checkpoint,
)
from chexpert_tpu.checkpoint.tracker import TRACKER_HEADER, update_tracker

__all__ = [
    "load_model_checkpoint",
    "load_optim_checkpoint",
    "save_model_checkpoint",
    "save_optim_checkpoint",
    "TRACKER_HEADER",
    "update_tracker",
]
