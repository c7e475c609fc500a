"""Multi-host SPMD input handling.

The reference's multi-process story was a SLURM script launching 32
duplicate processes with no distributed init (SURVEY.md section 2.4 P4).
The real thing: every host feeds its local shard of the global batch and
``jax.make_array_from_process_local_data`` assembles the global sharded
array (SURVEY.md section 5.8's recipe).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def global_batch_from_local(mesh: Mesh, local_batch: Any) -> Any:
    """Assemble a globally-sharded batch from per-process local data.

    Each process passes its local slice (local_batch_size = global /
    process_count); the returned arrays are jax.Arrays sharded on the
    ``data`` axis across all hosts. On a single process this is just a
    device_put with batch sharding.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def make(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(make, local_batch)


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch on ``data`` AND image height on ``model`` — spatial
    partitioning (the image-domain analogue of sequence parallelism).
    XLA inserts halo exchanges for the convolutions; useful for
    full-domain (589x789) generation that exceeds one chip's memory
    (SURVEY.md section 5.7)."""
    from .mesh import MODEL_AXIS

    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


__all__ = ["global_batch_from_local", "spatial_batch_sharding"]
