"""Utilities: checkpointing, configuration, profiling."""

from .checkpoint import CheckpointManager, restore_pytree, save_pytree
from .config import (
    DataConfig,
    DiffusionConfig,
    ExperimentConfig,
    TrainingConfig,
    UnetConfig,
)
from .plotting import (
    compare_loss_curves,
    load_loss_history,
    save_loss_curves,
    save_sample_grid,
)
from .profiling import StepTimer, count_params, memory_stats, model_summary, trace

__all__ = [
    "import_danra_torch_checkpoint",
    "load_pth_tar",
    "CheckpointManager",
    "DataConfig",
    "DiffusionConfig",
    "ExperimentConfig",
    "StepTimer",
    "TrainingConfig",
    "UnetConfig",
    "compare_loss_curves",
    "count_params",
    "memory_stats",
    "model_summary",
    "restore_pytree",
    "load_loss_history",
    "save_loss_curves",
    "save_pytree",
    "save_sample_grid",
    "trace",
]
from .torch_import import import_danra_torch_checkpoint, load_pth_tar
from .serving import export_sampler, load_sampler
