from em_adapt_tpu.train.optim import build_optimizer, lr_schedule
from em_adapt_tpu.train.state import TrainState
from em_adapt_tpu.train.trainer import Trainer, loss_fn, make_train_step

__all__ = [
    "TrainState",
    "Trainer",
    "build_optimizer",
    "loss_fn",
    "lr_schedule",
    "make_train_step",
]
