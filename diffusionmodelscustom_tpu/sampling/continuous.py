"""Continuous-time ancestral sampler (the Imagen cascade's p_sample_loop)
as one fused ``lax.scan``.

Parity with CascadedDDPM/imagen_pytorch.py:3850-4005: walk (t, t_next)
pairs from 1 to 0, estimate x0 from the configured objective, dynamically
threshold it, take the q_posterior step, and inject noise everywhere
except the final step.
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

    def step(carry, pair):
        x, i = carry
        t, t_next = pair
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
        noise = jax.random.normal(jax.random.fold_in(rng_loop, i), x.shape, x.dtype)
        # no noise on the final step (t_next == 0)
        is_last = (t_next <= 0.0).reshape((-1,) + (1,) * (x.ndim - 1))
        x = mean + jnp.where(is_last, 0.0, jnp.sqrt(variance) * noise)
        return (x, i + 1), None

    (x, _), _ = jax.lax.scan(step, (x, 0), (t_seq, t_next_seq))
    return jnp.clip(x, -1.0, 1.0)


__all__ = ["p_sample_loop_continuous"]
