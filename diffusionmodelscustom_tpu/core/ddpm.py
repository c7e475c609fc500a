"""Discrete-time DDPM process math (forward noising + ancestral reverse step).

TPU-native rebuild of the reference's ``DiffusionUtils``
(DDPM_DANRA_conditional/diffusion_DANRA_conditional.py:13-159 and
DDPM_clean_application/src/diffusion_modules.py:7-186). The class is a
frozen pytree of schedule arrays, so it can be closed over by ``jit`` and
carried through ``lax.scan`` without retracing; all methods are pure.

Reference quirks preserved exactly (they matter for numerical parity):

* ``sample_timesteps`` draws t ~ U{1, ..., T-1} — never t=0
  (diffusion_DANRA_conditional.py:79-83).
* The ancestral sampler iterates t = T-1 .. 1, never executing a t=0 step,
  and zeroes the injected noise at t == 1
  (diffusion_DANRA_conditional.py:127-157).
* The clean app's ``data_scaled`` flag multiplies all injected noise (and
  the initial x_T) by 0.005 (src/diffusion_modules.py:94-96,131-132,173-174).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .schedules import make_beta_schedule, right_pad_dims_to


def _extract(arr: jnp.ndarray, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Gather per-timestep scalars and right-pad to broadcast against x."""
    return right_pad_dims_to(x, arr[t])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Pytree of DDPM schedule constants plus the process math.

    Equivalent of the reference DiffusionUtils: betas/alphas/alpha_bar are
    precomputed once (diffusion_DANRA_conditional.py:47-51) and every
    method is a pure function usable inside jit/scan.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alpha_bar: jnp.ndarray
    # static (aux) fields — not traced
    n_timesteps: int = dataclasses.field(metadata={"static": True})
    noise_scale: float = dataclasses.field(default=1.0, metadata={"static": True})

    @classmethod
    def create(
        cls,
        n_timesteps: int = 1000,
        beta_min: float = 1e-4,
        beta_max: float = 0.02,
        scheduler: str = "linear",
        data_scaled: bool = False,
    ) -> "GaussianDiffusion":
        """Build schedule constants; mirrors DiffusionUtils.__init__.

        ``data_scaled`` reproduces the clean app's 0.005 noise scaling
        (src/diffusion_modules.py:94-96).
        """
        betas = make_beta_schedule(scheduler, n_timesteps, beta_min, beta_max)
        alphas = 1.0 - betas
        alpha_bar = jnp.cumprod(alphas)
        return cls(
            betas=betas,
            alphas=alphas,
            alpha_bar=alpha_bar,
            n_timesteps=n_timesteps,
            noise_scale=0.005 if data_scaled else 1.0,
        )

    # -- forward process ----------------------------------------------------

    def sample_timesteps(self, rng: jax.Array, batch: int) -> jnp.ndarray:
        """t ~ U{1, ..., T-1} (parity with randint(low=1, high=T),
        diffusion_DANRA_conditional.py:79-83)."""
        return jax.random.randint(rng, (batch,), 1, self.n_timesteps)

    def noise(self, rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        """Gaussian noise shaped like x, scaled by ``noise_scale``."""
        return jax.random.normal(rng, x.shape, x.dtype) * jnp.asarray(
            self.noise_scale, x.dtype
        )

    def q_sample(
        self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        """Forward noising x_t = sqrt(a_bar) x0 + sqrt(1-a_bar) eps.

        Equivalent of ``noiseImage`` (diffusion_DANRA_conditional.py:85-103)
        with noise supplied explicitly (functional RNG style).
        """
        a_bar = _extract(self.alpha_bar, t, x0).astype(x0.dtype)
        return jnp.sqrt(a_bar) * x0 + jnp.sqrt(1.0 - a_bar) * noise

    def noise_image(
        self, rng: jax.Array, x0: jnp.ndarray, t: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(x_t, eps) in one call — the reference's noiseImage signature."""
        eps = self.noise(rng, x0)
        return self.q_sample(x0, t, eps), eps

    # -- reverse process ----------------------------------------------------

    def p_step(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        predicted_noise: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """One ancestral reverse step (DDPM eq. 11 as coded in the reference).

        x <- 1/sqrt(alpha) * (x - (1-alpha)/sqrt(1-alpha_bar) * eps_hat)
             + sqrt(beta) * z
        (diffusion_DANRA_conditional.py:155-157). ``noise`` must already be
        zeroed by the caller at t == 1.
        """
        alpha = _extract(self.alphas, t, x).astype(x.dtype)
        beta = _extract(self.betas, t, x).astype(x.dtype)
        a_bar = _extract(self.alpha_bar, t, x).astype(x.dtype)
        mean = jax.lax.rsqrt(alpha) * (
            x - (1.0 - alpha) * jax.lax.rsqrt(1.0 - a_bar) * predicted_noise
        )
        return mean + jnp.sqrt(beta) * noise

    def pred_x0_from_noise(
        self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        """Invert q_sample: x0_hat = (x_t - sqrt(1-a_bar) eps)/sqrt(a_bar)."""
        a_bar = _extract(self.alpha_bar, t, x_t).astype(x_t.dtype)
        return (x_t - jnp.sqrt(1.0 - a_bar) * noise) * jax.lax.rsqrt(a_bar)

    def clip_eps(
        self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        """Re-express eps so the implied x0 lies in [-1, 1] (clip_denoised).

        Shared by the ancestral and DDIM samplers so the clamp-and-invert
        math has exactly one definition.
        """
        a_bar = _extract(self.alpha_bar, t, x_t).astype(x_t.dtype)
        x0 = jnp.clip(self.pred_x0_from_noise(x_t, t, noise), -1.0, 1.0)
        return (x_t - jnp.sqrt(a_bar) * x0) * jax.lax.rsqrt(1.0 - a_bar)

    def ddim_step(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        t_prev: jnp.ndarray,
        predicted_noise: jnp.ndarray,
        eta_noise: Optional[jnp.ndarray] = None,
        eta: float = 0.0,
        clip_denoised: bool = False,
    ) -> jnp.ndarray:
        """One deterministic (eta=0) or stochastic DDIM step.

        Fast-sampling path absent from the reference (its samplers are
        strictly T-step ancestral, diffusion_DANRA_conditional.py:127-157);
        added per the DDIM paper (arXiv:2010.02502) since few-step sampling
        is where TPU wall-clock is won.
        """
        a_bar_t = _extract(self.alpha_bar, t, x).astype(x.dtype)
        a_bar_prev = jnp.where(
            right_pad_dims_to(x, t_prev) >= 0,
            _extract(self.alpha_bar, jnp.maximum(t_prev, 0), x),
            jnp.ones_like(a_bar_t),
        ).astype(x.dtype)
        x0_hat = self.pred_x0_from_noise(x, t, predicted_noise)
        if clip_denoised:
            # standard x0 clamp (Ho et al. clip_denoised; data lives in
            # [-1, 1]); re-derive eps from the clamped x0 so the step's
            # direction term stays consistent
            x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
            predicted_noise = (
                x - jnp.sqrt(a_bar_t) * x0_hat
            ) * jax.lax.rsqrt(1.0 - a_bar_t)
        sigma = eta * jnp.sqrt(
            (1.0 - a_bar_prev) / (1.0 - a_bar_t) * (1.0 - a_bar_t / a_bar_prev)
        )
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_bar_prev - sigma**2, 0.0, None))
        out = jnp.sqrt(a_bar_prev) * x0_hat + dir_xt * predicted_noise
        if eta_noise is not None:
            out = out + sigma * eta_noise
        return out


__all__ = ["GaussianDiffusion"]
