"""Training layer: unified Trainer, train state, optimizers, distillation."""

from .distill import (
    DistillConfig,
    ProgressiveDistiller,
    distillation_target,
    progressive_distill,
    student_ddim_grid,
)
from .optim import make_optimizer, warmup_cosine_schedule
from .state import TrainState
from .trainer import Trainer, TrainerConfig

__all__ = [
    "DistillConfig",
    "ProgressiveDistiller",
    "TrainState",
    "Trainer",
    "TrainerConfig",
    "distillation_target",
    "make_optimizer",
    "progressive_distill",
    "student_ddim_grid",
    "warmup_cosine_schedule",
]
