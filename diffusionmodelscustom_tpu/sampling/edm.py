"""Elucidated (EDM) churn sampler as one fused ``lax.scan``.

Drives core/edm.py's per-step math over the rho-spaced sigma schedule —
the scan-fused equivalent of ``ElucidatedImagen.one_unet_sample``'s Python
loop (CascadedDDPM/elucidated_imagen.py:440-545).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.edm import EDMConfig

# denoise_fn(x, sigma_batch) -> denoised estimate (already preconditioned)
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def edm_sample(
    denoise_fn: DenoiseFn,
    config: EDMConfig,
    rng: jax.Array,
    shape: Sequence[int],
    *,
    x_init: Optional[jnp.ndarray] = None,
    clamp: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Stochastic Heun sampling from sigma_max down to 0."""
    sigmas = config.sample_schedule()  # (N+1,), trailing 0
    gammas = config.gammas(sigmas[:-1])

    rng_init, rng_loop = jax.random.split(rng)
    init_sigma = sigmas[0]
    x = init_sigma * jax.random.normal(rng_init, tuple(shape), dtype)
    if x_init is not None:
        x = x + x_init.astype(dtype)

    triples = jnp.stack([sigmas[:-1], sigmas[1:], gammas], axis=-1)

    def step(carry, triple):
        x, i = carry
        sigma, sigma_next, gamma = triple[0], triple[1], triple[2]
        x, _x0 = config.churn_step(
            denoise_fn, x, sigma, sigma_next, gamma, jax.random.fold_in(rng_loop, i)
        )
        return (x, i + 1), None

    (x, _), _ = jax.lax.scan(step, (x, 0), triples)
    if clamp:
        x = jnp.clip(x, -1.0, 1.0)
    return x


__all__ = ["edm_sample"]
