"""Rectified-flow / flow-matching process (beyond-reference capability).

The reference is strictly DDPM — its only process is the discrete
ancestral chain (diffusion_DANRA_conditional.py:13-159). Flow matching
(Lipman et al. 2023, arXiv:2210.02747) / rectified flow (Liu et al. 2023,
arXiv:2209.03003) instead regresses the straight-path velocity field

    x_tau = (1 - tau) * x0 + tau * eps,   v*(x_tau, tau) = eps - x0

with tau in [0, 1]. Straight probability paths make few-step ODE
integration accurate, which is exactly where TPU serving wall-clock is
won (docs/FEWSTEP.md) — a trained velocity model samples well at 8-25
Euler/Heun steps without any distillation stage.

TPU-first design: like ``GaussianDiffusion`` this is a frozen pytree with
pure methods, so it can be closed over by ``jit`` and carried through
``lax.scan``. It deliberately implements the same two-method contract the
unified Trainer consumes (``sample_timesteps`` + ``noise_image`` returning
``(x_t, regression_target)``), so

    Trainer(model, RectifiedFlow.create(), config)

trains a velocity model with any loss in the registry (simple /
sdf-weighted / ...), under the same mesh sharding, with zero trainer
changes. Times handed to the model are scaled to [0, n_timesteps) so the
existing sinusoidal time embeddings (ops/embeddings.py) see the same
numeric range they were designed for.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .schedules import right_pad_dims_to


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RectifiedFlow:
    """Linear-interpolant flow-matching process.

    ``n_timesteps`` is the time *scale* fed to the model's embedding (the
    process itself is continuous); ``time_sampling`` selects the training
    time distribution: 'uniform' (rectified flow) or 'logit_normal'
    (SD3-style, Esser et al. 2024 arXiv:2403.03206 — concentrates
    training signal at mid-path times where the velocity is hardest).
    """

    n_timesteps: int = dataclasses.field(default=1000, metadata={"static": True})
    time_sampling: str = dataclasses.field(
        default="uniform", metadata={"static": True}
    )
    logit_mean: float = dataclasses.field(default=0.0, metadata={"static": True})
    logit_std: float = dataclasses.field(default=1.0, metadata={"static": True})

    @classmethod
    def create(
        cls,
        n_timesteps: int = 1000,
        time_sampling: str = "uniform",
        logit_mean: float = 0.0,
        logit_std: float = 1.0,
    ) -> "RectifiedFlow":
        if time_sampling not in ("uniform", "logit_normal"):
            raise ValueError(
                f"unknown time_sampling {time_sampling!r}; "
                "options: uniform|logit_normal"
            )
        return cls(
            n_timesteps=n_timesteps,
            time_sampling=time_sampling,
            logit_mean=logit_mean,
            logit_std=logit_std,
        )

    # -- time handling --------------------------------------------------------

    def tau(self, t: jnp.ndarray) -> jnp.ndarray:
        """Model-scale time t in [0, T) -> path position tau in [0, 1)."""
        return t.astype(jnp.float32) / self.n_timesteps

    def sample_timesteps(self, rng: jax.Array, batch: int) -> jnp.ndarray:
        """Training times on the model scale [0, n_timesteps).

        Float-valued (the process is continuous); the sinusoidal
        embeddings accept float t unchanged.
        """
        if self.time_sampling == "logit_normal":
            z = jax.random.normal(rng, (batch,))
            taus = jax.nn.sigmoid(self.logit_mean + self.logit_std * z)
        else:
            taus = jax.random.uniform(rng, (batch,))
        return taus * self.n_timesteps

    # -- forward process (interpolant) ----------------------------------------

    def interpolate(
        self, x0: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """x_tau = (1 - tau) x0 + tau eps along the straight path."""
        tau = right_pad_dims_to(x0, self.tau(t)).astype(x0.dtype)
        return (1.0 - tau) * x0 + tau * eps

    def noise_image(
        self, rng: jax.Array, x0: jnp.ndarray, t: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(x_tau, velocity target) — the Trainer's process contract.

        The returned target is v* = eps - x0, so the Trainer's existing
        MSE/SDF-weighted losses regress the flow-matching objective.
        """
        eps = jax.random.normal(rng, x0.shape, x0.dtype)
        return self.interpolate(x0, eps, t), eps - x0

    # -- inversion helpers -----------------------------------------------------

    def pred_x0_from_v(
        self, x_t: jnp.ndarray, t: jnp.ndarray, v: jnp.ndarray
    ) -> jnp.ndarray:
        """x0 implied by a velocity prediction: x0 = x_tau - tau v."""
        tau = right_pad_dims_to(x_t, self.tau(t)).astype(x_t.dtype)
        return x_t - tau * v

    def clip_v(
        self, x_t: jnp.ndarray, t: jnp.ndarray, v: jnp.ndarray
    ) -> jnp.ndarray:
        """Re-express v so the implied x0 lies in [-1, 1] (clip_denoised).

        The flow analog of GaussianDiffusion.clip_eps: clamp the implied
        x0 and re-derive v = (x_tau - x0) / tau. Near tau = 0 the
        inversion is ill-conditioned, so the original v is kept there
        (the implied x0 equals x_t at tau = 0 anyway).
        """
        tau = right_pad_dims_to(x_t, self.tau(t)).astype(x_t.dtype)
        x0 = jnp.clip(self.pred_x0_from_v(x_t, t, v), -1.0, 1.0)
        safe = tau > 1e-4
        v_clipped = (x_t - x0) / jnp.where(safe, tau, 1.0)
        return jnp.where(safe, v_clipped, v)


def make_process(
    process: str = "ddpm",
    *,
    n_timesteps: int = 1000,
    beta_min: float = 1e-4,
    beta_max: float = 0.02,
    scheduler: str = "linear",
    data_scaled: bool = False,
    time_sampling: str = "uniform",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
):
    """Config-driven process factory shared by the CLIs.

    'ddpm' -> GaussianDiffusion (the reference's process); 'flow' ->
    RectifiedFlow (beyond-reference). Both satisfy the Trainer's
    sample_timesteps + noise_image contract.
    """
    if process == "flow":
        return RectifiedFlow.create(
            n_timesteps=n_timesteps,
            time_sampling=time_sampling,
            logit_mean=logit_mean,
            logit_std=logit_std,
        )
    if process == "ddpm":
        from .ddpm import GaussianDiffusion

        return GaussianDiffusion.create(
            n_timesteps=n_timesteps,
            beta_min=beta_min,
            beta_max=beta_max,
            scheduler=scheduler,
            data_scaled=data_scaled,
        )
    raise ValueError(f"unknown process {process!r}; options: ddpm|flow")


__all__ = ["RectifiedFlow", "make_process"]
