"""Diffusion training losses.

TPU-native rebuild of the reference loss inventory:

* ``simple_loss`` — plain MSE (SimpleLoss,
  DDPM_DANRA_conditional/training_DANRA_conditional.py:10-16).
* ``hybrid_loss`` — multi-timestep weighted MSE sum (HybridLoss,
  training_DANRA_conditional.py:18-31). The reference realizes this with T
  extra UNet forwards per batch (its TrainingPipeline_Hybrid,
  training_DANRA_conditional.py:190-199); here the loss semantics are kept
  while the trainer batches the timesteps into one vectorized forward.
* ``sdf_weighted_mse`` — ocean-downweighted MSE via a sigmoid of the
  signed-distance field (SDFWeightedMSELoss,
  training_DANRA_conditional.py:33-56).
* ``min_snr_weight`` — min-SNR-gamma loss reweighting used by the Imagen
  cascade (CascadedDDPM/imagen_pytorch.py:4416-4438).
* l1 / l2 / huber selectable per cascade stage
  (CascadedDDPM/imagen_pytorch.py:3363-3374).

All losses are pure functions returning a scalar in float32 (loss math is
kept out of bfloat16 so the optimizer sees full precision).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def simple_loss(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error (SimpleLoss parity)."""
    diff = predicted.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(diff * diff)


def l1_loss(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (Imagen ``loss_type='l1'``)."""
    return jnp.mean(jnp.abs(predicted.astype(jnp.float32) - target.astype(jnp.float32)))


def huber_loss(
    predicted: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0
) -> jnp.ndarray:
    """Smooth-L1/Huber (Imagen ``loss_type='huber'``)."""
    diff = jnp.abs(predicted.astype(jnp.float32) - target.astype(jnp.float32))
    quad = jnp.minimum(diff, delta)
    return jnp.mean(0.5 * quad * quad + delta * (diff - quad))


def hybrid_loss(
    predictions: jnp.ndarray, targets: jnp.ndarray, alpha: float = 0.5
) -> jnp.ndarray:
    """HybridLoss parity over stacked per-timestep predictions.

    ``predictions``/``targets`` carry a leading timestep axis of length T.
    loss = mse(pred[-1], tgt[0]) + alpha * sum_{t=1..T-1} mse(pred[t-1], tgt[t])
    (training_DANRA_conditional.py:25-31).
    """
    loss = simple_loss(predictions[-1], targets[0])
    per_t = jnp.mean(
        (predictions[:-1].astype(jnp.float32) - targets[1:].astype(jnp.float32)) ** 2,
        axis=tuple(range(1, predictions.ndim)),
    )
    return loss + alpha * jnp.sum(per_t)


def sdf_weighted_mse(
    predicted: jnp.ndarray,
    target: jnp.ndarray,
    sdf: jnp.ndarray,
    max_land_weight: float = 1.0,
    min_sea_weight: float = 0.5,
) -> jnp.ndarray:
    """SDF-weighted MSE (SDFWeightedMSELoss parity).

    weights = sigmoid(sdf) * (w_land - w_sea) + w_sea; mean(weights * err^2)
    (training_DANRA_conditional.py:44-56). Land (sdf >> 0) saturates to
    ``max_land_weight``; open sea to ``min_sea_weight``.
    """
    w = jnp.clip(
        jnp.reciprocal(1.0 + jnp.exp(-sdf.astype(jnp.float32))), 0.0, 1.0
    ) * (max_land_weight - min_sea_weight) + min_sea_weight
    err = predicted.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(w * err * err)


def min_snr_weight(
    alpha_bar_t: jnp.ndarray, gamma: float = 5.0, objective: str = "noise"
) -> jnp.ndarray:
    """Per-sample min-SNR-gamma loss weight.

    snr = alpha_bar / (1 - alpha_bar); weight = min(snr, gamma)/snr for the
    noise objective, min(snr, gamma)/(snr+1) for v-prediction, min(snr,
    gamma) for x0 (CascadedDDPM/imagen_pytorch.py:4416-4438).
    """
    snr = alpha_bar_t / jnp.clip(1.0 - alpha_bar_t, 1e-8, None)
    clipped = jnp.minimum(snr, gamma)
    if objective == "noise":
        return clipped / snr
    if objective == "v":
        return clipped / (snr + 1.0)
    if objective == "x_start":
        return clipped
    raise ValueError(f"unknown objective {objective!r}")


LOSS_REGISTRY: dict[str, Callable[..., jnp.ndarray]] = {
    "simple": simple_loss,
    "mse": simple_loss,
    "l1": l1_loss,
    "huber": huber_loss,
    "hybrid": hybrid_loss,
    "sdfweighted": sdf_weighted_mse,
}


def get_loss(name: str) -> Callable[..., jnp.ndarray]:
    """Look up a loss by the reference's selector strings
    (e.g. 'simple'/'hybrid'/'sdfweighted',
    ddpm_DANRA_conditional_wValid.py:375-414)."""
    try:
        return LOSS_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown loss {name!r}; options: {sorted(LOSS_REGISTRY)}"
        ) from None


def classifier_free_guidance(
    uncond: jnp.ndarray, cond: jnp.ndarray, cfg_scale: float | jnp.ndarray
) -> jnp.ndarray:
    """CFG as the reference codes it: lerp(uncond, cond, scale).

    scale == 0 -> unconditional, 1 -> conditional, > 1 extrapolates
    (DDPM_clean_application/src/diffusion_modules.py:156-160; the Imagen
    forward_with_cond_scale gate is the same lerp re-arranged,
    CascadedDDPM/imagen_pytorch.py:3716).
    """
    return uncond + (cond - uncond) * cfg_scale


__all__ = [
    "simple_loss",
    "l1_loss",
    "huber_loss",
    "hybrid_loss",
    "sdf_weighted_mse",
    "min_snr_weight",
    "get_loss",
    "classifier_free_guidance",
    "LOSS_REGISTRY",
]
