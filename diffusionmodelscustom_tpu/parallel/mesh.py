"""Device-mesh construction for SPMD training.

TPU-native replacement for the reference's distribution story (HF
Accelerate DDP wrapping, CascadedDDPM/trainer.py:352-358; the LUMI SLURM
launch that forked 32 duplicate processes with no torch.distributed init,
SURVEY.md section 2.4 P4): a single ``jax.sharding.Mesh`` with a ``data``
axis for batch parallelism and a ``model`` axis for fsdp-style parameter
sharding. Collectives are emitted by XLA from sharding annotations and
ride ICI within a slice / DCN across slices — there is no NCCL layer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis (pure data parallelism —
    the only strategy the reference actually had, SURVEY.md section 2.4 P1).
    Axis order puts ``model`` innermost so model-sharded collectives ride
    the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        assert len(devices) % n_model == 0, "device count must divide n_model"
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"requested {n_data}x{n_model} mesh but only {len(devices)} devices"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (jax.distributed) — the SPMD equivalent
    of the SLURM multi-process launch the reference scripted but never
    wired up (DDPM_test_lumi__128x128.sh:8-23). No-op on a single host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "initialize_distributed"]
