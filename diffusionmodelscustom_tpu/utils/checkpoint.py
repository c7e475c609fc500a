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


def is_remote_url(path) -> bool:
    """True for fsspec URLs (``memory://``, ``gs://``, ``s3://`` …) — the
    reference's ImagenTrainer accepted any fsspec folder for checkpoints
    (CascadedDDPM/trainer.py:329-336); plain paths stay on Orbax."""
    return isinstance(path, str) and "://" in path


def url_fs(path):
    """(filesystem, normalized_path) for an fsspec URL."""
    import fsspec

    return fsspec.core.url_to_fs(str(path))


def save_pytree(path, tree: Any) -> None:
    """One-shot full-pytree save (the simple .pth.tar role).

    Local paths use Orbax; fsspec URLs serialize the pytree's array leaves
    with flax msgpack into ``<path>.msgpack`` on the target filesystem
    (static fields like apply_fn/tx are excluded, as with Orbax)."""
    if is_remote_url(path):
        from flax import serialization

        fs, p = url_fs(path)
        parent = p.rsplit("/", 1)[0] if "/" in p else ""
        if parent:
            fs.makedirs(parent, exist_ok=True)
        data = serialization.to_bytes(_strip_static(tree))
        with fs.open(p + ".msgpack", "wb") as f:
            f.write(data)
        return
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path), _strip_static(tree), force=True)
    ckptr.wait_until_finished()


def restore_pytree(path, template: Any) -> Any:
    if is_remote_url(path):
        from flax import serialization

        fs, p = url_fs(path)
        with fs.open(p + ".msgpack", "rb") as f:
            data = f.read()
        restored = serialization.from_bytes(_strip_static(template), data)
        return _merge_static(template, restored)
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(str(path), _strip_static(template))
    return _merge_static(template, restored)


class FolderFS:
    """Minimal checkpoint-folder operations over a local ``Path`` or any
    fsspec URL — the abstraction behind ImagenTrainer's checkpoint-folder
    rotation matching the reference's fsspec folder support
    (CascadedDDPM/trainer.py:329-336,712-753)."""

    def __init__(self, folder):
        self.folder = str(folder)
        self.remote = is_remote_url(self.folder)
        if self.remote:
            self.fs, self.root = url_fs(self.folder)

    def mkdirs(self) -> None:
        if self.remote:
            self.fs.makedirs(self.root, exist_ok=True)
        else:
            Path(self.folder).mkdir(parents=True, exist_ok=True)

    def join(self, *parts) -> str:
        """Child path as a string usable by save_pytree/restore_pytree
        (keeps the URL protocol for remote folders)."""
        if self.remote:
            return self.fs.unstrip_protocol(
                "/".join([self.root.rstrip("/")] + list(parts))
            )
        return str(Path(self.folder, *parts))

    def list_ckpts(self):
        """Sorted [(step, path_str)] of ``ckpt_<N>`` entries."""
        out = []
        if self.remote:
            if not self.fs.exists(self.root):
                return []
            for p in self.fs.ls(self.root, detail=False):
                name = str(p).rstrip("/").rsplit("/", 1)[-1]
                if name.startswith("ckpt_"):
                    out.append(
                        (int(name.split("_")[1]), self.fs.unstrip_protocol(p))
                    )
        else:
            folder = Path(self.folder)
            if folder.exists():
                for p in folder.glob("ckpt_*"):
                    if p.is_dir():
                        out.append((int(p.name.split("_")[1]), str(p)))
        return sorted(out)

    @staticmethod
    def rmtree(path: str) -> None:
        if is_remote_url(path):
            fs, p = url_fs(path)
            fs.rm(p, recursive=True)
        else:
            import shutil

            shutil.rmtree(path)

    @staticmethod
    def unet_exists(ckpt_path: str, name: str) -> bool:
        """Does ``<ckpt_path>/<name>`` hold a saved pytree?"""
        if is_remote_url(ckpt_path):
            fs, p = url_fs(ckpt_path.rstrip("/") + "/" + name)
            return fs.exists(p + ".msgpack")
        return (Path(ckpt_path) / name).exists()

    @staticmethod
    def child(ckpt_path: str, name: str) -> str:
        if is_remote_url(ckpt_path):
            return ckpt_path.rstrip("/") + "/" + name
        return str(Path(ckpt_path) / name)


__all__ = [
    "CheckpointManager",
    "save_pytree",
    "restore_pytree",
    "is_remote_url",
    "url_fs",
    "FolderFS",
]
