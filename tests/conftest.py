"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh since real
multi-chip TPU hardware is not available in CI; this substitutes for the
fake backend the reference never had (SURVEY.md section 4).

Note: ``jax.config.update`` is used (not env vars) because the test
environment's sitecustomize registers a remote TPU PJRT plugin and
force-sets ``jax_platforms`` at interpreter start; an explicit config
update after import is the only override that sticks.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
