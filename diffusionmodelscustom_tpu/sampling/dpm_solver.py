"""DPM-Solver++(2M): second-order multistep fast sampler.

A training-free fast-sampling path on top of the same discrete DDPM
schedule (the reference only has the full 799/999-step ancestral loop —
SURVEY.md section 6 "sampling cost"; PAPERS.md points at the
training-free-acceleration literature). Data-prediction multistep form
(Lu et al., DPM-Solver++), deterministic:

    lambda_i = log(alpha_i / sigma_i)
    h_i = lambda_i - lambda_{i-1}
    D_i = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1},  r_i = h_{i-1}/h_i
    x_{i+1} = (sigma_{i+1}/sigma_i) x - alpha_{i+1} (e^{-h} - 1) D_i

Runs as one ``lax.scan`` like every other sampler here.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.ddpm import GaussianDiffusion
from ..core.losses import classifier_free_guidance

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def dpmpp_2m_sample(
    denoise_fn: DenoiseFn,
    diffusion: GaussianDiffusion,
    rng: jax.Array,
    shape: Sequence[int],
    *,
    num_steps: int = 20,
    x_init: Optional[jnp.ndarray] = None,
    uncond_fn: Optional[DenoiseFn] = None,
    cfg_scale: float = 0.0,
    clip_denoised: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Deterministic 2nd-order multistep sampling (eps-prediction model).

    ``clip_denoised`` clamps each x0 prediction to [-1, 1] (the DPM-Solver
    paper's "dynamic thresholding" simplification for bounded data); at
    few-step budgets the unclamped estimate compounds — measured on the
    held-out parity fields at 25 steps: RMSE 6.4 -> 3.6, FID 397 -> 67
    (FEWSTEP.json).
    """
    if x_init is None:
        x = jax.random.normal(rng, tuple(shape), dtype)
    else:
        x = x_init.astype(dtype)
    batch = x.shape[0]

    # timestep grid T-1 .. 0 and the terminal "clean" state
    ts = jnp.linspace(diffusion.n_timesteps - 1, 0, num_steps).round().astype(
        jnp.int32
    )
    a_bar = diffusion.alpha_bar[ts]
    alphas = jnp.sqrt(a_bar)
    sigmas = jnp.sqrt(1.0 - a_bar)
    lambdas = jnp.log(alphas / jnp.clip(sigmas, 1e-10, None))
    # terminal target: alpha=1, sigma=0 — approach with a large lambda
    alphas = jnp.concatenate([alphas, jnp.ones((1,))])
    sigmas = jnp.concatenate([sigmas, jnp.full((1,), 1e-4)])
    lambdas = jnp.concatenate(
        [lambdas, jnp.log(1.0 / 1e-4)[None]]
    )

    def predict_x0(x, t_scalar):
        t = jnp.full((batch,), t_scalar, jnp.int32)
        eps = denoise_fn(x, t)
        if cfg_scale > 0.0 and uncond_fn is not None:
            eps = classifier_free_guidance(uncond_fn(x, t), eps, cfg_scale)
        x0 = diffusion.pred_x0_from_noise(x, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    def step(carry, i):
        x, x0_prev, h_prev = carry
        t_i = ts[i]
        lam = lambdas[i]
        lam_next = lambdas[i + 1]
        h = lam_next - lam
        sig, sig_next = sigmas[i], sigmas[i + 1]
        alpha_next = alphas[i + 1]

        x0 = predict_x0(x, t_i)

        # 2M correction when a previous estimate exists (i > 0)
        r = h_prev / h
        d_corr = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        d = jnp.where(i > 0, d_corr, x0)

        x_next = (sig_next / sig) * x - alpha_next * jnp.expm1(-h) * d
        return (x_next, x0, h), None

    h0 = jnp.ones(())  # placeholder; unused on the first step
    (x, _, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x), h0), jnp.arange(num_steps)
    )
    return x


__all__ = ["dpmpp_2m_sample"]
