"""Utilities: checkpointing, configuration."""

from .checkpoint import CheckpointManager, restore_pytree, save_pytree

__all__ = ["CheckpointManager", "restore_pytree", "save_pytree"]
