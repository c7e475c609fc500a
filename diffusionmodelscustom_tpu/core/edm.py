"""Elucidated (EDM / Karras) diffusion: preconditioning, training noise
distribution, loss weighting, and the stochastic churn sampler step math.

TPU-native rebuild of the cascade's elucidated variant
(CascadedDDPM/elucidated_imagen.py:77-939):

* c_skip/c_out/c_in/c_noise preconditioning (elucidated_imagen.py:325-338)
* preconditioned network forward (eq. 7)       (:340-370)
* rho-spaced sigma schedule (eq. 5)            (:376-391, in schedules.py)
* stochastic churn sampler with 2nd-order
  (Heun) correction                            (:440-545)
* log-normal training sigmas + EDM loss weight (:755-760)

The sampler here is expressed as pure per-step math so sampling/edm.py can
drive it under one ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .schedules import karras_sigma_schedule, right_pad_dims_to


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EDMConfig:
    """Per-unet elucidated hyperparameters (elucidated_imagen.py:96-110)."""

    num_sample_steps: int = dataclasses.field(default=32, metadata={"static": True})
    sigma_min: float = dataclasses.field(default=0.002, metadata={"static": True})
    sigma_max: float = dataclasses.field(default=80.0, metadata={"static": True})
    sigma_data: float = dataclasses.field(default=0.5, metadata={"static": True})
    rho: float = dataclasses.field(default=7.0, metadata={"static": True})
    P_mean: float = dataclasses.field(default=-1.2, metadata={"static": True})
    P_std: float = dataclasses.field(default=1.2, metadata={"static": True})
    S_churn: float = dataclasses.field(default=80.0, metadata={"static": True})
    S_tmin: float = dataclasses.field(default=0.05, metadata={"static": True})
    S_tmax: float = dataclasses.field(default=50.0, metadata={"static": True})
    S_noise: float = dataclasses.field(default=1.003, metadata={"static": True})

    # -- preconditioning (elucidated_imagen.py:325-338) --------------------

    def c_skip(self, sigma):
        return (self.sigma_data**2) / (sigma**2 + self.sigma_data**2)

    def c_out(self, sigma):
        return sigma * self.sigma_data * (self.sigma_data**2 + sigma**2) ** -0.5

    def c_in(self, sigma):
        return (sigma**2 + self.sigma_data**2) ** -0.5

    def c_noise(self, sigma):
        return jnp.log(sigma) * 0.25

    # -- network wrapper ---------------------------------------------------

    def precondition(
        self,
        net_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        noised: jnp.ndarray,
        sigma: jnp.ndarray,
    ) -> jnp.ndarray:
        """Denoised estimate D(x; sigma) = c_skip x + c_out F(c_in x,
        c_noise(sigma)) (elucidated_imagen.py:340-370). ``net_fn`` takes
        (scaled_image, noise_cond) and returns the raw net output."""
        padded = right_pad_dims_to(noised, sigma)
        out = net_fn(
            (self.c_in(padded) * noised).astype(noised.dtype),
            self.c_noise(sigma),
        )
        return self.c_skip(padded) * noised + self.c_out(padded) * out

    # -- training ----------------------------------------------------------

    def noise_distribution(self, rng: jax.Array, batch: int) -> jnp.ndarray:
        """sigma ~ exp(P_mean + P_std * N(0,1)) (elucidated_imagen.py:758)."""
        return jnp.exp(
            self.P_mean + self.P_std * jax.random.normal(rng, (batch,))
        )

    def loss_weight(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """lambda(sigma) = (sigma^2 + sigma_data^2) / (sigma*sigma_data)^2
        (elucidated_imagen.py:755)."""
        return (sigma**2 + self.sigma_data**2) * (sigma * self.sigma_data) ** -2

    # -- sampling ----------------------------------------------------------

    def sample_schedule(self) -> jnp.ndarray:
        return karras_sigma_schedule(
            self.num_sample_steps, self.sigma_min, self.sigma_max, self.rho
        )

    def gammas(self, sigmas: jnp.ndarray) -> jnp.ndarray:
        """Churn amount per step: min(S_churn/N, sqrt(2)-1) inside
        [S_tmin, S_tmax], else 0 (elucidated_imagen.py churn setup)."""
        gamma = min(self.S_churn / self.num_sample_steps, 2**0.5 - 1.0)
        in_range = (sigmas >= self.S_tmin) & (sigmas <= self.S_tmax)
        return jnp.where(in_range, gamma, 0.0)

    def churn_step(
        self,
        denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        images: jnp.ndarray,
        sigma: jnp.ndarray,
        sigma_next: jnp.ndarray,
        gamma: jnp.ndarray,
        rng: jax.Array,
        *,
        inpaint_images: jnp.ndarray | None = None,
        inpaint_masks: jnp.ndarray | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One stochastic Heun step (elucidated_imagen.py:505-545).

        ``denoise_fn(x, sigma_batch)`` returns the *denoised* estimate
        (i.e. already preconditioned). Returns (next_images, x0_estimate).

        With ``inpaint_images``/``inpaint_masks`` (mask 1 = known pixel),
        the known region is substituted after the churn noise is added,
        carrying ONLY the churn-delta noise (std sqrt(sigma_hat^2 -
        sigma^2), i.e. zero when gamma == 0) rather than noise at the
        sampler's current sigma — verified byte-for-byte against the
        reference's blend ``images_hat * ~mask + (inpaint_images +
        added_noise) * mask`` (elucidated_imagen.py:498-500). This is a
        reference quirk kept deliberately for parity; its resampling
        loop (repaint) is what re-mixes the known region across steps.
        """
        eps = self.S_noise * jax.random.normal(rng, images.shape, images.dtype)
        sigma_hat = sigma + gamma * sigma
        added = jnp.sqrt(jnp.clip(sigma_hat**2 - sigma**2, 0.0, None))
        images_hat = images + added * eps
        if inpaint_images is not None and inpaint_masks is not None:
            m = inpaint_masks.astype(images_hat.dtype)
            images_hat = images_hat * (1.0 - m) + (
                inpaint_images.astype(images_hat.dtype) + added * eps
            ) * m

        batch = images.shape[0]
        sig_hat_b = jnp.full((batch,), 1.0) * sigma_hat
        model_out = denoise_fn(images_hat, sig_hat_b)
        d = (images_hat - model_out) / sigma_hat
        images_next = images_hat + (sigma_next - sigma_hat) * d

        # Heun 2nd-order correction, skipped when sigma_next == 0.
        def correct(imgs_next):
            sig_next_b = jnp.full((batch,), 1.0) * sigma_next
            model_out_next = denoise_fn(imgs_next, sig_next_b)
            d_prime = (imgs_next - model_out_next) / sigma_next
            corrected = images_hat + 0.5 * (sigma_next - sigma_hat) * (d + d_prime)
            return corrected, model_out_next

        def no_correct(imgs_next):
            return imgs_next, model_out

        images_next, x0 = jax.lax.cond(
            sigma_next > 0.0, correct, no_correct, images_next
        )
        return images_next, x0


__all__ = ["EDMConfig"]
