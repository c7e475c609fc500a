"""Compile-level SPMD evidence: the sharded train/sampling graphs emit
the XLA collectives the design claims (SURVEY.md section 5.8 — XLA's
collectives replace the reference's Accelerate/NCCL layer entirely).

These tests inspect the compiled HLO text of the REAL train step on the
8-device virtual CPU mesh: data parallelism must synchronize gradients
with an all-reduce; fsdp parameter sharding must all-gather weights at
use and reduce-scatter (or all-reduce per XLA's choice) the gradients;
spatially-sharded forwards must exchange halos/activations with
collective-permute or all-gather. This pins the distributed semantics at
the compiler boundary, independent of numerics (which
tests/test_parallel.py pins by equivalence).
"""

import jax
import jax.numpy as jnp

from diffusionmodelscustom_tpu.core import GaussianDiffusion
from diffusionmodelscustom_tpu.models import ConditionalUNet
from diffusionmodelscustom_tpu.parallel import (
    batch_sharding,
    make_mesh,
    state_sharding,
)
from diffusionmodelscustom_tpu.train import Trainer, TrainerConfig


def tiny_trainer():
    model = ConditionalUNet(
        out_channels=1, base_channels=8, time_dim=16, n_heads=2,
        attention_levels=(), attention_levels_up=(),
    )
    diff = GaussianDiffusion.create(n_timesteps=20)
    return Trainer(model, diff, TrainerConfig(ema=False))


def _compiled_hlo(mesh, n_model: int) -> str:
    trainer = tiny_trainer()
    batch = {"img": jax.random.normal(jax.random.key(1), (8, 8, 8, 1))}
    state = trainer.init_state(jax.random.key(0), batch)
    st_shard = state_sharding(mesh, state, min_size=0 if n_model > 1 else 2**14)
    step = jax.jit(
        trainer._train_step_impl,
        in_shardings=(st_shard, batch_sharding(mesh), None),
        out_shardings=(st_shard, None),
    )
    with mesh:
        compiled = step.lower(state, batch, jax.random.key(2)).compile()
    return compiled.as_text()


def test_data_parallel_step_emits_gradient_allreduce():
    mesh = make_mesh(8, 1)
    hlo = _compiled_hlo(mesh, n_model=1)
    assert "all-reduce" in hlo, "dp grad sync must be an XLA all-reduce"


def test_fsdp_step_emits_allgather():
    # model-axis sharded params: XLA must gather weights at use and
    # reduce the grads (reduce-scatter or all-reduce, XLA's choice)
    mesh = make_mesh(4, 2)
    hlo = _compiled_hlo(mesh, n_model=2)
    assert "all-gather" in hlo, "fsdp weights must all-gather at use"
    assert "reduce-scatter" in hlo or "all-reduce" in hlo

def test_spatial_sharded_forward_exchanges_activations():
    from diffusionmodelscustom_tpu.parallel import spatial_batch_sharding

    mesh = make_mesh(4, 2)
    model = ConditionalUNet(
        out_channels=1, base_channels=8, time_dim=16, n_heads=2,
        attention_levels=(), attention_levels_up=(),
    )
    x = jax.random.normal(jax.random.key(0), (4, 32, 32, 1))
    t = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.key(1), x, t)

    fwd = jax.jit(
        lambda p, xx: model.apply(p, xx, t),
        in_shardings=(None, spatial_batch_sharding(mesh)),
    )
    with mesh:
        hlo = fwd.lower(params, x).compile().as_text()
    # conv halo exchange / pooled reductions across the spatial shards
    assert (
        "collective-permute" in hlo
        or "all-gather" in hlo
        or "all-reduce" in hlo
    ), "spatially sharded forward must communicate across shards"
