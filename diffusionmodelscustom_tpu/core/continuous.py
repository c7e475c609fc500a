"""Continuous-time Gaussian diffusion (t in [0,1], log-SNR parameterized).

TPU-native rebuild of the cascade's ``GaussianDiffusionContinuousTimes``
(CascadedDDPM/imagen_pytorch.py:591-830): q_sample / q_posterior (DDPM++
eq. 33) / q_sample_from_to (the lowres augmentation-noise trick) /
predict_start_from_{noise,v} / calculate_v. A frozen pytree with pure
methods, usable inside jit/scan.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .schedules import (
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    log_snr_to_alpha_sigma,
    right_pad_dims_to,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ContinuousDiffusion:
    """Continuous-time VP diffusion with a named log-SNR schedule."""

    noise_schedule: str = dataclasses.field(
        default="cosine", metadata={"static": True}
    )
    num_timesteps: int = dataclasses.field(default=1000, metadata={"static": True})

    def log_snr(self, t: jnp.ndarray) -> jnp.ndarray:
        if self.noise_schedule == "linear":
            return beta_linear_log_snr(t)
        if self.noise_schedule == "cosine":
            return alpha_cosine_log_snr(t)
        raise ValueError(f"invalid noise schedule {self.noise_schedule!r}")

    # -- time handling ------------------------------------------------------

    def sample_random_times(self, rng: jax.Array, batch: int) -> jnp.ndarray:
        """t ~ U(0, 1) (imagen_pytorch.py:637-647)."""
        return jax.random.uniform(rng, (batch,))

    def get_times(self, batch: int, noise_level: float) -> jnp.ndarray:
        return jnp.full((batch,), noise_level, jnp.float32)

    def get_condition(self, times: jnp.ndarray) -> jnp.ndarray:
        """Times -> log-SNR conditioning signal fed to the UNet."""
        return self.log_snr(times)

    def get_sampling_timesteps(self, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(t, t_next) pairs walking 1 -> 0 in num_timesteps steps
        (imagen_pytorch.py:668-681); shapes (T, B)."""
        times = jnp.linspace(1.0, 0.0, self.num_timesteps + 1)
        t = jnp.broadcast_to(times[:-1, None], (self.num_timesteps, batch))
        t_next = jnp.broadcast_to(times[1:, None], (self.num_timesteps, batch))
        return t, t_next

    # -- process math -------------------------------------------------------

    def q_sample(
        self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ):
        """Returns (x_t, log_snr, alpha, sigma) (imagen_pytorch.py:727-755)."""
        log_snr = self.log_snr(t).astype(x_start.dtype)
        log_snr_pad = right_pad_dims_to(x_start, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr_pad)
        return alpha * x_start + sigma * noise, log_snr, alpha, sigma

    def q_sample_from_to(
        self,
        x_from: jnp.ndarray,
        from_t: jnp.ndarray,
        to_t: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """Re-noise a sample from time from_t to a *higher* noise time to_t
        without denoising first — the lowres augmentation conditioning trick
        (imagen_pytorch.py:757-793)."""
        log_snr = right_pad_dims_to(x_from, self.log_snr(from_t))
        log_snr_to = right_pad_dims_to(x_from, self.log_snr(to_t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        alpha_to, sigma_to = log_snr_to_alpha_sigma(log_snr_to)
        return x_from * (alpha_to / alpha) + noise * (
            sigma_to * alpha - sigma * alpha_to
        ) / alpha

    def q_posterior(
        self,
        x_start: jnp.ndarray,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        t_next: jnp.ndarray | None = None,
    ):
        """Posterior mean/variance per eq. 33 (imagen_pytorch.py:684-723)."""
        if t_next is None:
            t_next = jnp.clip(t - 1.0 / self.num_timesteps, 0.0, None)
        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        log_snr_next = right_pad_dims_to(x_t, self.log_snr(t_next))
        alpha, _sigma = log_snr_to_alpha_sigma(log_snr)
        alpha_next, sigma_next = log_snr_to_alpha_sigma(log_snr_next)
        c = -jnp.expm1(log_snr - log_snr_next)
        posterior_mean = alpha_next * (x_t * (1.0 - c) / alpha + c * x_start)
        posterior_variance = (sigma_next**2) * c
        posterior_log_variance = jnp.log(jnp.clip(posterior_variance, 1e-20, None))
        return posterior_mean, posterior_variance, posterior_log_variance

    def predict_start_from_noise(
        self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return (x_t - sigma * noise) / jnp.clip(alpha, 1e-8, None)

    def predict_start_from_v(
        self, x_t: jnp.ndarray, t: jnp.ndarray, v: jnp.ndarray
    ) -> jnp.ndarray:
        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return alpha * x_t - sigma * v

    def calculate_v(
        self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        """v-objective target: v = alpha*eps - sigma*x0."""
        log_snr = right_pad_dims_to(x_start, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return alpha * noise - sigma * x_start


def dynamic_threshold(
    x_start: jnp.ndarray, percentile: float = 0.95
) -> jnp.ndarray:
    """Imagen dynamic thresholding: clamp to the per-sample |x| quantile s
    (>=1) and rescale by s (imagen_pytorch.py:3751-3769)."""
    flat = jnp.abs(x_start.reshape(x_start.shape[0], -1))
    s = jnp.quantile(flat, percentile, axis=-1)
    s = jnp.maximum(s, 1.0)
    s = right_pad_dims_to(x_start, s)
    return jnp.clip(x_start, -s, s) / s


__all__ = ["ContinuousDiffusion", "dynamic_threshold"]
