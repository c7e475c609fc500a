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
    inpaint_images: Optional[jnp.ndarray] = None,
    inpaint_masks: Optional[jnp.ndarray] = None,
    resample_times: int = 5,
) -> jnp.ndarray:
    """Stochastic Heun sampling from sigma_max down to 0.

    With ``inpaint_images``/``inpaint_masks`` (mask 1 = keep known pixel,
    both already in model space at the sampled resolution), each sigma step
    runs ``resample_times`` repaint resampling passes: churn-blend the
    known region, Heun-step, then re-noise back up by (sigma - sigma_next)
    except on the last pass of a step and the last step overall — the
    reference's inpainting-with-resampling loop
    (elucidated_imagen.py:486-540). The final image hard-pastes the known
    region after clamping (:546-547).
    """
    sigmas = config.sample_schedule()  # (N+1,), trailing 0
    gammas = config.gammas(sigmas[:-1])

    has_inpaint = inpaint_images is not None and inpaint_masks is not None
    n_resample = resample_times if has_inpaint else 1
    inpaint_kw = (
        dict(inpaint_images=inpaint_images, inpaint_masks=inpaint_masks)
        if has_inpaint
        else {}
    )

    rng_init, rng_loop = jax.random.split(rng)
    init_sigma = sigmas[0]
    x = init_sigma * jax.random.normal(rng_init, tuple(shape), dtype)
    if x_init is not None:
        x = x + x_init.astype(dtype)

    n_steps = sigmas.shape[0] - 1
    triples = jnp.stack([sigmas[:-1], sigmas[1:], gammas], axis=-1)

    def step(carry, inputs):
        x, i = carry
        triple = inputs
        sigma, sigma_next, gamma = triple[0], triple[1], triple[2]
        is_last_step = i == n_steps - 1

        def resample(x, r):
            key = jax.random.fold_in(rng_loop, i * n_resample + r)
            x, _x0 = config.churn_step(
                denoise_fn, x, sigma, sigma_next, gamma, key, **inpaint_kw
            )
            if has_inpaint:
                # repaint renoise, skipped on the final pass / final step
                renoise = jnp.logical_and(r < n_resample - 1, ~is_last_step)
                z = jax.random.normal(
                    jax.random.fold_in(key, 1), x.shape, x.dtype
                )
                x = x + jnp.where(renoise, sigma - sigma_next, 0.0) * z
            return x

        for r in range(n_resample):  # static unroll; n_resample is small
            x = resample(x, r)
        return (x, i + 1), None

    (x, _), _ = jax.lax.scan(step, (x, 0), triples)
    if clamp:
        x = jnp.clip(x, -1.0, 1.0)
    if has_inpaint:
        m = inpaint_masks.astype(x.dtype)
        x = x * (1.0 - m) + inpaint_images.astype(x.dtype) * m
    return x


__all__ = ["edm_sample"]
