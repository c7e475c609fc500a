"""Flow-matching ODE sampler as a single fused ``lax.scan``.

Integrates dx/dtau = v(x, tau) from tau = 1 (pure noise) to tau = 0
(data) for a velocity model trained with ``core.flow.RectifiedFlow``.
Euler matches the straight-path training objective (rectified flow,
arXiv:2209.03003); Heun (trapezoid) gives second-order accuracy at two
model evaluations per step, the same discipline as the EDM churn sampler
(sampling/edm.py).

Same TPU structure as the other samplers (sampling/ancestral.py): the
whole trajectory is one scan whose body is the jit-fused model call —
zero host round-trips, weights resident across steps.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.flow import RectifiedFlow
from ..core.losses import classifier_free_guidance

# velocity_fn(x, t) -> predicted velocity; t is on the model scale
# [0, n_timesteps) and conditioning is closed over (the DenoiseFn
# convention of sampling/ancestral.py).
VelocityFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def flow_sample(
    velocity_fn: VelocityFn,
    flow: RectifiedFlow,
    rng: jax.Array,
    shape: Sequence[int],
    *,
    num_steps: int = 25,
    method: str = "euler",
    x_init: Optional[jnp.ndarray] = None,
    uncond_fn: Optional[VelocityFn] = None,
    cfg_scale: float = 0.0,
    clip_denoised: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Few-step ODE sampling of a flow-matching model.

    ``clip_denoised`` clamps the per-step implied x0 to [-1, 1]
    (RectifiedFlow.clip_v) — the same load-bearing stabilization the
    few-step DDIM path uses (docs/FEWSTEP.md).
    """
    if method not in ("euler", "heun"):
        raise ValueError(f"unknown method {method!r}; options: euler|heun")
    x = (
        jax.random.normal(rng, tuple(shape), dtype)
        if x_init is None
        else x_init.astype(dtype)
    )
    batch = x.shape[0]

    taus = jnp.linspace(1.0, 0.0, num_steps + 1)
    pairs = jnp.stack([taus[:-1], taus[1:]], axis=1)

    def predict(x, tau):
        t = jnp.full((batch,), tau * flow.n_timesteps, jnp.float32)
        v = velocity_fn(x, t)
        if cfg_scale > 0.0 and uncond_fn is not None:
            v = classifier_free_guidance(uncond_fn(x, t), v, cfg_scale)
        if clip_denoised:
            v = flow.clip_v(x, t, v)
        return v

    def step(x, pair):
        tau, tau_next = pair[0], pair[1]
        dt = tau - tau_next
        v1 = predict(x, tau)
        x_euler = x - dt * v1
        if method == "heun":
            # final step (tau_next == 0) stays plain Euler — the same
            # discipline as the EDM churn sampler (sampling/edm.py): the
            # exact velocity field (x - x0)/tau is singular at tau = 0,
            # so a trapezoid correction there amplifies prediction error
            def correct(xe):
                v2 = predict(xe, tau_next)
                return x - dt * 0.5 * (v1 + v2)

            x = jax.lax.cond(tau_next > 0.0, correct, lambda xe: xe, x_euler)
        else:
            x = x_euler
        return x, None

    x, _ = jax.lax.scan(step, x, pairs)
    return x


__all__ = ["flow_sample"]
