"""SPMD parallelism: mesh construction and sharding rules."""

from .mesh import DATA_AXIS, MODEL_AXIS, initialize_distributed, make_mesh
from .multihost import global_batch_from_local, spatial_batch_sharding
from .sharding import (
    batch_sharding,
    params_sharding,
    replicated,
    shard_batch,
    state_sharding,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "global_batch_from_local",
    "spatial_batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "params_sharding",
    "replicated",
    "shard_batch",
    "state_sharding",
]
