"""Noise schedules for discrete- and continuous-time diffusion.

Reimplements (TPU-first, pure ``jnp``) every schedule family the reference
ships:

* ``linear_beta_schedule`` — classic DDPM linear betas
  (ref: DDPM_DANRA_conditional/diffusion_DANRA_conditional.py:61-62).
* ``cosine_ramp_beta_schedule`` — the reference g2 "cosine" variant, which is
  *not* Nichol-Dhariwal: it cosine-ramps beta itself from beta_min to
  beta_max (ref: diffusion_DANRA_conditional.py:65-77).
* ``cosine_beta_schedule`` — the true Nichol-Dhariwal cosine alpha-bar
  schedule used by the clean application
  (ref: DDPM_clean_application/src/diffusion_modules.py:62-69).
* continuous-time log-SNR schedules used by the Imagen cascade:
  ``beta_linear_log_snr`` / ``alpha_cosine_log_snr``
  (ref: CascadedDDPM/imagen_pytorch.py:549-577).

All functions are pure, shape-static, and differentiable where meaningful,
so they can live inside ``jit``/``scan`` bodies without retracing.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def linear_beta_schedule(
    n_timesteps: int, beta_min: float = 1e-4, beta_max: float = 0.02
) -> jnp.ndarray:
    """Linearly spaced betas: ``linspace(beta_min, beta_max, T)``."""
    return jnp.linspace(beta_min, beta_max, n_timesteps, dtype=jnp.float32)


def cosine_ramp_beta_schedule(
    n_timesteps: int, beta_min: float = 1e-4, beta_max: float = 0.02
) -> jnp.ndarray:
    """The reference g2 "cosine" schedule: a cosine *ramp of beta*.

    beta[j] = beta_min + 0.5*(beta_max-beta_min)*(1 + cos(i/(T-1) * pi))
    where i runs T-1 .. 0 as j runs 0 .. T-1, so betas rise from beta_min to
    beta_max along a half-cosine. Matches
    diffusion_DANRA_conditional.py:65-77 exactly (not Nichol-Dhariwal).
    """
    t = n_timesteps - 1
    i = jnp.arange(n_timesteps - 1, -1, -1, dtype=jnp.float32)
    return beta_min + 0.5 * (beta_max - beta_min) * (1.0 + jnp.cos(i / t * jnp.pi))


def cosine_beta_schedule(n_timesteps: int, clip_max: float = 0.9999) -> jnp.ndarray:
    """True Nichol-Dhariwal cosine schedule (clean app's "cosine").

    f(t) = cos^2(((t/T + 0.008) / 1.008) * pi/2); alpha_bar = f(t)/f(0);
    beta_t = 1 - alpha_bar(t)/alpha_bar(t-1), clipped to [1e-4, clip_max].
    Matches DDPM_clean_application/src/diffusion_modules.py:62-69.
    """
    t = jnp.linspace(0.0, n_timesteps, n_timesteps + 1, dtype=jnp.float32)
    ft = jnp.cos(((t / n_timesteps + 0.008) / 1.008) * jnp.pi / 2.0) ** 2
    alpha_bar = ft / ft[0]
    betas = 1.0 - alpha_bar[1:] / alpha_bar[:-1]
    return jnp.clip(betas, 1e-4, clip_max)


def make_beta_schedule(
    scheduler: str,
    n_timesteps: int,
    beta_min: float = 1e-4,
    beta_max: float = 0.02,
) -> jnp.ndarray:
    """Dispatch on the reference's scheduler names.

    ``"linear"`` and ``"cosine_ramp"`` mirror g2's DiffusionUtils
    (diffusion_DANRA_conditional.py:53-77); ``"cosine"`` mirrors g3's true
    cosine (src/diffusion_modules.py:62-69).
    """
    if scheduler == "linear":
        return linear_beta_schedule(n_timesteps, beta_min, beta_max)
    if scheduler == "cosine_ramp":
        return cosine_ramp_beta_schedule(n_timesteps, beta_min, beta_max)
    if scheduler == "cosine":
        return cosine_beta_schedule(n_timesteps)
    raise ValueError(
        f"unknown scheduler {scheduler!r}; expected linear|cosine|cosine_ramp"
    )


# ---------------------------------------------------------------------------
# Continuous-time log-SNR schedules (Imagen cascade, t in [0, 1]).
# ---------------------------------------------------------------------------


def beta_linear_log_snr(t: jnp.ndarray) -> jnp.ndarray:
    """log-SNR for the variance-preserving linear-beta limit.

    log_snr(t) = -log(expm1(1e-4 + 10 t^2))
    (ref: CascadedDDPM/imagen_pytorch.py:549-551).
    """
    return -jnp.log(jnp.expm1(1e-4 + 10.0 * t * t))


def alpha_cosine_log_snr(t: jnp.ndarray, s: float = 0.008) -> jnp.ndarray:
    """log-SNR for the cosine schedule in continuous time.

    log_snr(t) = -log(cos((t+s)/(1+s) * pi/2)^-2 - 1)
    (ref: CascadedDDPM/imagen_pytorch.py:563-565).
    """
    c = jnp.cos((t + s) / (1.0 + s) * jnp.pi * 0.5)
    return -jnp.log(jnp.clip(c**-2 - 1.0, 1e-12, None))


def log_snr_to_alpha_sigma(
    log_snr: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(alpha, sigma) with alpha^2 + sigma^2 = 1 from a log-SNR value.

    alpha = sqrt(sigmoid(log_snr)); sigma = sqrt(sigmoid(-log_snr))
    (ref: CascadedDDPM/imagen_pytorch.py:577-579).
    """
    alpha = jnp.sqrt(jnp.clip(jnp.reciprocal(1.0 + jnp.exp(-log_snr)), 0.0, 1.0))
    sigma = jnp.sqrt(jnp.clip(jnp.reciprocal(1.0 + jnp.exp(log_snr)), 0.0, 1.0))
    return alpha, sigma


def karras_sigma_schedule(
    num_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
) -> jnp.ndarray:
    """rho-spaced EDM sigma schedule with a trailing zero.

    sigma_i = (smax^(1/rho) + i/(N-1) (smin^(1/rho) - smax^(1/rho)))^rho
    (ref: CascadedDDPM/elucidated_imagen.py:376-391).
    """
    steps = jnp.arange(num_steps, dtype=jnp.float32)
    inv_rho = 1.0 / rho
    sigmas = (
        sigma_max**inv_rho
        + steps / max(num_steps - 1, 1) * (sigma_min**inv_rho - sigma_max**inv_rho)
    ) ** rho
    return jnp.concatenate([sigmas, jnp.zeros((1,), dtype=jnp.float32)])


def right_pad_dims_to(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Right-pad ``t`` with singleton dims until it broadcasts against ``x``.

    The reference uses einops-based padding for the same purpose
    (CascadedDDPM/imagen_pytorch.py:476-480); here it is a reshape.
    """
    padding_dims = x.ndim - t.ndim
    if padding_dims <= 0:
        return t
    return t.reshape(t.shape + (1,) * padding_dims)


__all__ = [
    "linear_beta_schedule",
    "cosine_ramp_beta_schedule",
    "cosine_beta_schedule",
    "make_beta_schedule",
    "beta_linear_log_snr",
    "alpha_cosine_log_snr",
    "log_snr_to_alpha_sigma",
    "karras_sigma_schedule",
    "right_pad_dims_to",
]
