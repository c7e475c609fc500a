"""Sharding rules: batch on ``data``, parameters fsdp-sharded on ``model``.

With ``jit`` + these NamedShardings, XLA inserts the gradient
all-reduce/reduce-scatter + all-gather pattern automatically — the
TPU-native replacement for DDP's bucketed NCCL all-reduce
(CascadedDDPM/trainer.py:1060-1066).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim on the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device_put a host batch pytree with batch-dim sharding."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def _fsdp_spec(x: jnp.ndarray, min_size: int, n_model: int) -> P:
    """Choose a PartitionSpec sharding the largest divisible axis on
    ``model``; replicate small/indivisible tensors (standard fsdp-style
    weight sharding)."""
    if x.ndim == 0 or x.size < min_size:
        return P()
    # prefer the largest dim divisible by the model-axis size
    dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
    for d in dims:
        if x.shape[d] % n_model == 0 and x.shape[d] >= n_model:
            spec = [None] * x.ndim
            spec[d] = MODEL_AXIS
            return P(*spec)
    return P()


def params_sharding(
    mesh: Mesh, params: Any, *, min_size: int = 2**14
) -> Any:
    """Pytree of NamedShardings for parameters.

    With ``model`` axis size 1 everything is replicated (pure DP). With a
    larger model axis, weights above ``min_size`` elements are sharded on
    their largest divisible dimension (fsdp); XLA all-gathers them at use
    and reduce-scatters the grads.
    """
    n_model = mesh.shape[MODEL_AXIS]
    if n_model == 1:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _fsdp_spec(x, min_size, n_model)), params
    )


def state_sharding(mesh: Mesh, state: Any, *, min_size: int = 2**14) -> Any:
    """Shardings for a full TrainState: every array leaf follows the fsdp
    rule (optimizer moments share their parameter's sharding shape-wise;
    scalars replicate)."""
    n_model = mesh.shape[MODEL_AXIS]

    def leaf_sharding(x):
        if not hasattr(x, "shape"):
            return replicated(mesh)
        if n_model == 1:
            return replicated(mesh)
        return NamedSharding(mesh, _fsdp_spec(x, min_size, n_model))

    return jax.tree_util.tree_map(leaf_sharding, state)


__all__ = [
    "batch_sharding",
    "replicated",
    "shard_batch",
    "params_sharding",
    "state_sharding",
]
