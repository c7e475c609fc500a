"""Worker process for tests/test_multiprocess.py — not a test module.

Runs one data-parallel flagship-family train step as one rank of a REAL
2-process ``jax.distributed`` job (4 local CPU devices each -> 8 global),
assembling its local half of the batch via ``global_batch_from_local``.
Prints a single MPRESULT line the parent asserts on.

Usage: python tests/_mp_worker.py <rank> <coordinator_port>
"""

import pathlib
import sys

rank = int(sys.argv[1])
port = sys.argv[2]

import jax

# CPU platform with 4 local devices per process (the sitecustomize forces
# jax_platforms=axon,cpu; override before the first backend use)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from diffusionmodelscustom_tpu.parallel import initialize_distributed

initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp

from diffusionmodelscustom_tpu.core import GaussianDiffusion
from diffusionmodelscustom_tpu.models import ConditionalUNet
from diffusionmodelscustom_tpu.parallel import (
    global_batch_from_local,
    make_mesh,
)
from diffusionmodelscustom_tpu.train import Trainer, TrainerConfig

model = ConditionalUNet(
    out_channels=1, base_channels=8, time_dim=16, n_heads=2,
    attention_levels=(), attention_levels_up=(),
)
diff = GaussianDiffusion.create(n_timesteps=20)
trainer = Trainer(model, diff, TrainerConfig(ema=False))

# the same deterministic GLOBAL batch on every rank; each rank feeds only
# its own half through global_batch_from_local (the multi-host input path)
g = np.random.default_rng(1).normal(size=(8, 8, 8, 1)).astype(np.float32)
state = trainer.init_state(jax.random.key(0), {"img": jnp.asarray(g[:4])})

mesh = make_mesh(8, 1)
local = g[rank * 4:(rank + 1) * 4]
gbatch = global_batch_from_local(mesh, {"img": local})
with mesh:
    state2, m = trainer.train_step(state, gbatch, jax.random.key(2))

loss = float(jax.device_get(m["loss"]))
fingerprint = float(jax.device_get(
    sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(state2.params))
))
print(f"MPRESULT rank={rank} loss={loss:.10f} fp={fingerprint:.8f}",
      flush=True)
