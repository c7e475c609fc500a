"""Utilities: checkpointing, configuration, profiling."""

from .checkpoint import CheckpointManager, restore_pytree, save_pytree
from .config import (
    DataConfig,
    DiffusionConfig,
    ExperimentConfig,
    TrainingConfig,
    UnetConfig,
)
from .profiling import StepTimer, count_params, memory_stats, model_summary, trace

__all__ = [
    "CheckpointManager",
    "DataConfig",
    "DiffusionConfig",
    "ExperimentConfig",
    "StepTimer",
    "TrainingConfig",
    "UnetConfig",
    "count_params",
    "memory_stats",
    "model_summary",
    "restore_pytree",
    "save_pytree",
    "trace",
]
