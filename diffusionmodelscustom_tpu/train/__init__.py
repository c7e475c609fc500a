"""Training layer: unified Trainer, train state, optimizers."""

from .optim import make_optimizer, warmup_cosine_schedule
from .state import TrainState
from .trainer import Trainer, TrainerConfig

__all__ = [
    "TrainState",
    "Trainer",
    "TrainerConfig",
    "make_optimizer",
    "warmup_cosine_schedule",
]
