from . import losses
from .loop import Trainer, TrainState, make_lr_schedule

__all__ = ["losses", "Trainer", "TrainState", "make_lr_schedule"]
