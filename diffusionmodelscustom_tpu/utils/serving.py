"""Ahead-of-time export of compiled samplers for serving.

Production deployments should not pay a 30 s+ trace/compile on every
process start. ``export_sampler`` serializes the jitted sampling
computation (StableHLO via ``jax.export``) to bytes that a serving
process loads with :func:`load_sampler` and calls immediately — no Python
model code, flax, or retracing needed on the serving side; only the
matching accelerator platform.

Example::

    blob = export_sampler(
        lambda params, key: ancestral_sample(denoise, diffusion, key, shape),
        (params, jax.random.key(0)),
    )
    Path("sampler.bin").write_bytes(blob)
    # ... serving process ...
    fn = load_sampler(Path("sampler.bin").read_bytes())
    images = fn(params, jax.random.key(7))
"""

from __future__ import annotations

from typing import Any, Callable

import jax


def export_sampler(fn: Callable[..., Any], example_args: tuple) -> bytes:
    """Trace + lower ``fn`` at ``example_args`` and serialize it.

    ``fn`` must be jittable with all shapes determined by the example
    arguments (static configuration belongs in the closure).
    """
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    return bytes(exported.serialize())  # serialize() returns a bytearray


def load_sampler(blob: bytes) -> Callable[..., Any]:
    """Deserialize an exported sampler into a callable.

    The call is jitted so repeated invocations reuse the loaded
    executable; inputs must match the exported shapes/dtypes.
    """
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return jax.jit(exported.call)


__all__ = ["export_sampler", "load_sampler"]
