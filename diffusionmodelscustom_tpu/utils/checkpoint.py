"""Checkpoint save/restore via Orbax.

Replaces the reference's two checkpoint formats:

* g1-g3 ``torch.save({'network_params','optimizer_params'})`` ``.pth.tar``
  best-val snapshots which **lost** optimizer/epoch state on resume
  (training_DANRA_conditional.py:755-772; acknowledged TODO at
  src/main_ddpm.py:1-5);
* g4 ImagenTrainer's full-state bundles with ``max_checkpoints_keep``
  rotation (CascadedDDPM/trainer.py:712-890).

Here the FULL TrainState pytree (params, optimizer state, EMA, BatchNorm
stats, step) round-trips exactly, with retention rotation; restore works
onto sharded arrays (orbax restores to the live sharding of the target).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager bound to one directory."""

    def __init__(
        self,
        directory,
        *,
        max_to_keep: int = 3,
        best_mode: Optional[str] = "min",
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m["monitor"]) if best_mode else None,
            best_mode=best_mode or "min",
            enable_async_checkpointing=False,
        )
        self.manager = ocp.CheckpointManager(str(self.directory), options=options)

    def save(self, step: int, state: Any, monitor: Optional[float] = None) -> None:
        metrics = {"monitor": float(monitor)} if monitor is not None else None
        self.manager.save(
            step, args=ocp.args.StandardSave(_strip_static(state)), metrics=metrics
        )
        self.manager.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the template's structure (shardings preserved)."""
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint found"
        stripped = _strip_static(state_template)
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(stripped)
        )
        return _merge_static(state_template, restored)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def best_step(self) -> Optional[int]:
        return self.manager.best_step()

    def close(self):
        self.manager.close()


def _strip_static(state: Any) -> Any:
    """Arrays-only view of a TrainState-like pytree (static fields like
    apply_fn/tx are reconstructed by the caller's template)."""
    return jax.tree_util.tree_map(lambda x: x, state)


def _merge_static(template: Any, restored: Any) -> Any:
    """Rebuild the full object: restored array leaves + template statics."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    r_leaves = jax.tree_util.tree_leaves(restored)
    assert len(leaves) == len(r_leaves), "checkpoint structure mismatch"
    return jax.tree_util.tree_unflatten(treedef, r_leaves)


def save_pytree(path, tree: Any) -> None:
    """One-shot full-pytree save (the simple .pth.tar role)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path), _strip_static(tree), force=True)
    ckptr.wait_until_finished()


def restore_pytree(path, template: Any) -> Any:
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(str(path), _strip_static(template))
    return _merge_static(template, restored)


__all__ = [
    "CheckpointManager",
    "save_pytree",
    "restore_pytree",
]
