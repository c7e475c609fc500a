"""Reverse-diffusion samplers as single fused ``lax.scan`` loops.

The reference's samplers are Python for-loops issuing one UNet call per
step with host-side tqdm sync (799 sequential forwards,
diffusion_DANRA_conditional.py:127-157; 999 in the clean app,
src/diffusion_modules.py:145-181 — hot-loop #2 in SURVEY.md section 3).
Here the whole loop is one ``lax.scan`` whose body is the jit-fused UNet
step: zero host round-trips, weights stay in HBM/VMEM across steps, and
XLA pipelines the per-step elementwise math into the UNet epilogue.

Semantics parity: iterate t = T-1 .. 1 (no t=0 step), zero injected noise
at t == 1, CFG as lerp(uncond, cond, scale) when ``cfg_scale > 0``
(src/diffusion_modules.py:156-160).

``clip_denoised`` is a beyond-reference option: clamp the implied x0
prediction to [-1, 1] each step (standard DDPM practice, Ho et al. 2020
"clip_denoised"). The reference never clips — its published samples reach
hundreds of degrees out of the physical range (PARITY.md yardstick,
out-of-range fraction up to 0.104). Off by default for exact parity.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.ddpm import GaussianDiffusion
from ..core.losses import classifier_free_guidance

# denoise_fn(x, t) -> predicted noise; conditioning is closed over.
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _predict(
    denoise_fn: DenoiseFn,
    uncond_fn: Optional[DenoiseFn],
    cfg_scale: float,
    x: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    eps = denoise_fn(x, t)
    if cfg_scale > 0.0 and uncond_fn is not None:
        eps_uncond = uncond_fn(x, t)
        eps = classifier_free_guidance(eps_uncond, eps, cfg_scale)
    return eps


def ancestral_sample(
    denoise_fn: DenoiseFn,
    diffusion: GaussianDiffusion,
    rng: jax.Array,
    shape: Sequence[int],
    *,
    x_init: Optional[jnp.ndarray] = None,
    uncond_fn: Optional[DenoiseFn] = None,
    cfg_scale: float = 0.0,
    clip_denoised: bool = False,
    churn: float = 0.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Full T-step ancestral sampling, fused into one scan.

    Matches DiffusionUtils.sample: x ~ N(0, I) (times noise_scale for the
    data_scaled variant), then T-1 reverse steps
    (src/diffusion_modules.py:127-186). ``clip_denoised`` clamps the
    implied x0 to [-1, 1] each step (off by default — see module doc).

    ``churn > 0`` is a beyond-reference stochasticity knob — the discrete
    DDPM analogue of EDM's S_churn (elucidated_imagen.py:393-549,
    Karras et al. 2022): before each reverse step at level t the state is
    lifted to t_hat = t + ceil(churn * t) with marginal-preserving forward
    noise, then one skip-ancestral (eta=1 generalized DDIM) step lands on
    t-1. Extra injected-then-removed noise re-randomizes high-frequency
    content each step; probed against the two Moran's-I parity cells
    (scripts/probe_churn.py). churn=0 keeps the exact reference chain.
    """
    rng_init, rng_loop = jax.random.split(rng)
    if x_init is None:
        x = jax.random.normal(rng_init, tuple(shape), dtype) * jnp.asarray(
            diffusion.noise_scale, dtype
        )
    else:
        x = x_init.astype(dtype)
    batch = x.shape[0]

    # timesteps T-1 .. 1 (never 0) — diffusion_DANRA_conditional.py:127-130
    ts = jnp.arange(diffusion.n_timesteps - 1, 0, -1)

    def step(x, i):
        t = jnp.full((batch,), i, jnp.int32)
        eps = _predict(denoise_fn, uncond_fn, cfg_scale, x, t)
        if clip_denoised:
            eps = diffusion.clip_eps(x, t, eps)
        step_rng = jax.random.fold_in(rng_loop, i)
        z = jax.random.normal(step_rng, x.shape, x.dtype) * jnp.asarray(
            diffusion.noise_scale, x.dtype
        )
        z = jnp.where(i > 1, z, jnp.zeros_like(z))
        x = diffusion.p_step(x, t, eps, z)
        return x, None

    def churn_step(x, i):
        # lift t -> t_hat with q(x_that | x_t) (keeps the forward marginal)
        t_hat_i = jnp.minimum(
            i + jnp.ceil(churn * i).astype(jnp.int32),
            diffusion.n_timesteps - 1,
        )
        ab_t = diffusion.alpha_bar[i].astype(x.dtype)
        ab_hat = diffusion.alpha_bar[t_hat_i].astype(x.dtype)
        ratio = ab_hat / ab_t
        extra_var = jnp.maximum((1.0 - ab_hat) - ratio * (1.0 - ab_t), 0.0)
        lift_rng = jax.random.fold_in(rng_loop, i + diffusion.n_timesteps)
        x = jnp.sqrt(ratio) * x + jnp.sqrt(extra_var) * jax.random.normal(
            lift_rng, x.shape, x.dtype
        )
        t_hat = jnp.full((batch,), t_hat_i, jnp.int32)
        eps = _predict(denoise_fn, uncond_fn, cfg_scale, x, t_hat)
        # one stochastic skip step t_hat -> i-1 (eta=1 generalized DDIM =
        # the ancestral posterior when t_hat == i and the stride is 1)
        z = jax.random.normal(
            jax.random.fold_in(rng_loop, i), x.shape, x.dtype
        )
        z = jnp.where(i > 1, z, jnp.zeros_like(z))
        x = diffusion.ddim_step(
            x, t_hat, jnp.full((batch,), i - 1, jnp.int32), eps, z, 1.0,
            clip_denoised=clip_denoised,
        )
        return x, None

    x, _ = jax.lax.scan(churn_step if churn > 0.0 else step, x, ts)
    return x


def ddim_sample(
    denoise_fn: DenoiseFn,
    diffusion: GaussianDiffusion,
    rng: jax.Array,
    shape: Sequence[int],
    *,
    num_steps: int = 50,
    eta: float = 0.0,
    x_init: Optional[jnp.ndarray] = None,
    uncond_fn: Optional[DenoiseFn] = None,
    cfg_scale: float = 0.0,
    clip_denoised: bool = False,
    churn: float = 0.0,
    t_start: Optional[int] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Few-step DDIM sampling (arXiv:2010.02502) — the TPU fast path.

    ``t_start`` (default ``n_timesteps - 1``) begins the evenly spaced
    grid at a mid-chain timestep instead of the top — the building block
    for restart-style recipes (Xu et al. 2023, arXiv:2306.14878): run a
    short base chain, forward-noise the output to ``t_restart`` with
    ``q_sample``, then re-descend with ``ddim_sample(x_init=...,
    t_start=t_restart)``. Pass ``x_init`` with any ``t_start < T - 1``;
    from-noise starts only make sense from the top of the schedule.

    Uses an evenly spaced sub-sequence of the training timesteps; the
    final step targets alpha_bar = 1 (t_prev = -1 sentinel).
    ``clip_denoised`` clamps the per-step x0 estimate to [-1, 1] — at
    few-step budgets the unclamped estimate drifts far outside the data
    range early in the chain and the error compounds (measured on the
    held-out parity fields at 50 steps: RMSE 12.2 unclipped vs 5.4
    clipped, FID 2441 vs 162 — FEWSTEP.json); keep False only for
    exact ancestral-parity runs.

    ``churn > 0`` applies the same inject-then-redenoise stochasticity as
    ``ancestral_sample``'s churn (EDM S_churn analogue): before each DDIM
    step at t the state is lifted to t_hat = t + ceil(churn * t) with
    marginal-preserving forward noise, and the (still deterministic-eta)
    DDIM step runs from t_hat down to t_prev. This is the measured fix
    for few-step chains' high-frequency-residue Moran's-I/PSD signature
    (PARITY.md section 3); churn=0 keeps the exact DDIM chain.
    """
    rng_init, rng_loop = jax.random.split(rng)
    if x_init is None:
        x = jax.random.normal(rng_init, tuple(shape), dtype)
    else:
        x = x_init.astype(dtype)
    batch = x.shape[0]

    # Evenly spaced timesteps from t_start (default T-1) down; append -1
    # as the "clean" end.
    top = diffusion.n_timesteps - 1 if t_start is None else int(t_start)
    seq = jnp.linspace(top, 0, num_steps).round().astype(jnp.int32)
    t_pairs = jnp.stack([seq, jnp.concatenate([seq[1:], jnp.array([-1])])], 1)

    def step(x, pair):
        t_i, t_prev = pair[0], pair[1]
        if churn > 0.0:
            # lift t -> t_hat with q(x_that | x_t): preserves the forward
            # marginal, re-randomizes high-frequency content
            t_hat_i = jnp.minimum(
                t_i + jnp.ceil(churn * t_i).astype(jnp.int32),
                diffusion.n_timesteps - 1,
            )
            ab_t = diffusion.alpha_bar[t_i].astype(x.dtype)
            ab_hat = diffusion.alpha_bar[t_hat_i].astype(x.dtype)
            ratio = ab_hat / ab_t
            extra_var = jnp.maximum(
                (1.0 - ab_hat) - ratio * (1.0 - ab_t), 0.0
            )
            lift_rng = jax.random.fold_in(
                rng_loop, t_i + diffusion.n_timesteps
            )
            x = jnp.sqrt(ratio) * x + jnp.sqrt(extra_var) * jax.random.normal(
                lift_rng, x.shape, x.dtype
            )
            t = jnp.full((batch,), t_hat_i, jnp.int32)
        else:
            t = jnp.full((batch,), t_i, jnp.int32)
        eps = _predict(denoise_fn, uncond_fn, cfg_scale, x, t)
        z = None
        if eta > 0.0:
            z = jax.random.normal(
                jax.random.fold_in(rng_loop, t_i), x.shape, x.dtype
            )
        x = diffusion.ddim_step(
            x, t, jnp.full((batch,), t_prev, jnp.int32), eps, z, eta,
            clip_denoised=clip_denoised,
        )
        return x, None

    x, _ = jax.lax.scan(step, x, t_pairs)
    return x


def ddim_restart_sample(
    denoise_fn: DenoiseFn,
    diffusion: GaussianDiffusion,
    rng: jax.Array,
    shape: Sequence[int],
    *,
    num_steps: int = 8,
    restart_t: int = 200,
    restart_steps: int = 4,
    churn: float = 0.1,
    restart_churn: float = 0.3,
    clip_denoised: bool = True,
    uncond_fn: Optional[DenoiseFn] = None,
    cfg_scale: float = 0.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Two-phase few-step DDIM with a restart re-descent (Xu et al.
    2023, arXiv:2306.14878 adapted to the discrete DDPM grid).

    Phase 1 runs a ``num_steps`` churned DDIM descent from the top of
    the schedule; phase 2 forward-noises the result to ``restart_t``
    (``q_sample`` — marginal-preserving) and re-descends with
    ``restart_steps`` evenly spaced steps from there. The re-descent
    contracts accumulated discretization error faster than spending the
    same evals on a finer single pass — measured on the held-out parity
    protocol (docs/FEWSTEP.md ``restart_*`` rows, round 5): at 12 total
    evals (8+4, restart_t=200, churn 0.1/0.3) it MATCHES the 800-step
    ancestral chain on every metric including Moran's I and PSD; at 6
    evals (4+2, t=200, churn 0.3/0.8) it beats the 800-step RMSE where
    a plain 6-step churned chain plateaus ~0.8 degC higher.

    Total model evaluations = ``num_steps + restart_steps``.
    """
    r1, r2, r3 = jax.random.split(rng, 3)
    kw = dict(
        uncond_fn=uncond_fn, cfg_scale=cfg_scale,
        clip_denoised=clip_denoised, dtype=dtype,
    )
    base = ddim_sample(
        denoise_fn, diffusion, r1, shape, num_steps=num_steps,
        churn=churn, **kw,
    )
    t_r = jnp.full((base.shape[0],), restart_t, jnp.int32)
    x_r, _ = diffusion.noise_image(r2, base, t_r)
    return ddim_sample(
        denoise_fn, diffusion, r3, shape, num_steps=restart_steps,
        churn=restart_churn, t_start=restart_t, x_init=x_r, **kw,
    )


__all__ = ["ancestral_sample", "ddim_restart_sample", "ddim_sample"]
