"""Continuous-time ancestral sampler (the Imagen cascade's p_sample_loop)
as one fused ``lax.scan``.

Parity with CascadedDDPM/imagen_pytorch.py:3850-4005: walk (t, t_next)
pairs from 1 to 0, estimate x0 from the configured objective, dynamically
threshold it, take the q_posterior step, and inject noise everywhere
except the final step. Supports inpainting with repaint-style resampling
(imagen_pytorch.py:4070-4084): the known region is replaced by
q_sample(inpaint_image, t) each step, and each timestep can be re-noised
and re-denoised ``resample_times`` times.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.continuous import ContinuousDiffusion, dynamic_threshold

# model_fn(x, log_snr_cond, t) -> prediction (noise / x0 / v per objective)
ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def p_sample_loop_continuous(
    model_fn: ModelFn,
    scheduler: ContinuousDiffusion,
    rng: jax.Array,
    shape: Sequence[int],
    *,
    pred_objective: str = "noise",
    use_dynamic_threshold: bool = True,
    threshold_percentile: float = 0.95,
    x_init: Optional[jnp.ndarray] = None,
    inpaint_images: Optional[jnp.ndarray] = None,
    inpaint_masks: Optional[jnp.ndarray] = None,  # True where KNOWN
    resample_times: int = 5,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Full reverse pass; returns the final x0-clamped sample."""
    rng_init, rng_loop = jax.random.split(rng)
    x = (
        jax.random.normal(rng_init, tuple(shape), dtype)
        if x_init is None
        else x_init.astype(dtype)
    )
    batch = x.shape[0]
    t_seq, t_next_seq = scheduler.get_sampling_timesteps(batch)

    has_inpaint = inpaint_images is not None and inpaint_masks is not None
    n_resample = resample_times if has_inpaint else 1
    if has_inpaint:
        inpaint_masks = inpaint_masks.astype(x.dtype)

    def denoise_once(x, t, t_next, step_rng):
        if has_inpaint:
            known_noise = jax.random.normal(
                jax.random.fold_in(step_rng, 1), x.shape, x.dtype
            )
            x_known, *_ = scheduler.q_sample(
                inpaint_images.astype(x.dtype), t, known_noise
            )
            x = x * (1.0 - inpaint_masks) + x_known * inpaint_masks

        pred = model_fn(x, scheduler.get_condition(t), t)
        if pred_objective == "noise":
            x_start = scheduler.predict_start_from_noise(x, t, pred)
        elif pred_objective == "x_start":
            x_start = pred
        elif pred_objective == "v":
            x_start = scheduler.predict_start_from_v(x, t, pred)
        else:
            raise ValueError(f"unknown objective {pred_objective!r}")

        if use_dynamic_threshold:
            x_start = dynamic_threshold(x_start, threshold_percentile)
        else:
            x_start = jnp.clip(x_start, -1.0, 1.0)

        mean, variance, _log_var = scheduler.q_posterior(x_start, x, t, t_next)
        noise = jax.random.normal(
            jax.random.fold_in(step_rng, 2), x.shape, x.dtype
        )
        is_last = (t_next <= 0.0).reshape((-1,) + (1,) * (x.ndim - 1))
        return mean + jnp.where(is_last, 0.0, jnp.sqrt(variance) * noise)

    def step(carry, pair):
        x, i = carry
        t, t_next = pair
        step_rng = jax.random.fold_in(rng_loop, i)

        if n_resample == 1:
            x = denoise_once(x, t, t_next, step_rng)
        else:

            def resample_body(r, x):
                r_rng = jax.random.fold_in(step_rng, r)
                x = denoise_once(x, t, t_next, r_rng)
                # repaint: re-noise t_next -> t except on the final pass
                renoise = jax.random.normal(
                    jax.random.fold_in(r_rng, 3), x.shape, x.dtype
                )
                x_back = scheduler.q_sample_from_to(x, t_next, t, renoise)
                return jnp.where(r < n_resample - 1, x_back, x)

            x = jax.lax.fori_loop(0, n_resample, resample_body, x)

        return (x, i + 1), None

    (x, _), _ = jax.lax.scan(step, (x, 0), (t_seq, t_next_seq))
    if has_inpaint:
        x = x * (1.0 - inpaint_masks) + inpaint_images.astype(x.dtype) * inpaint_masks
    return jnp.clip(x, -1.0, 1.0)


__all__ = ["p_sample_loop_continuous"]
