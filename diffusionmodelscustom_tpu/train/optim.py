"""Optimizers and LR schedules matching the reference surface.

The reference uses: AdamW (ddpm_DANRA_conditional_wValid.py:385-387), plain
Adam and SGD selectable by flag (src/main_ddpm.py:376-409), Lion for the
Imagen trainer (CascadedDDPM/trainer.py:402-446), ReduceLROnPlateau stepped
on train loss (ddpm_DANRA_conditional_wValid.py:417,679) and
CosineAnnealing with linear warmup (trainer.py:427-446). All of these map
onto optax transforms here.
"""

from __future__ import annotations

from typing import Optional

import optax


def make_optimizer(
    name: str = "adamw",
    learning_rate: float = 3e-4,
    weight_decay: float = 0.01,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    grad_clip_norm: Optional[float] = None,
    schedule: Optional[optax.Schedule] = None,
    plateau_patience: Optional[int] = None,
    plateau_factor: float = 0.1,
    plateau_accumulation: int = 1,
    plateau_min_scale: float = 0.0,
) -> optax.GradientTransformation:
    """Build the optimizer chain.

    ``schedule`` (an optax schedule) takes precedence over the flat
    ``learning_rate``. ``plateau_patience`` appends a reduce-on-plateau
    scaler — the trainer must then pass ``loss=`` into ``tx.update`` via
    ``optax.contrib.reduce_on_plateau`` conventions (we wrap that in the
    Trainer, matching the reference stepping the scheduler on *train*
    loss, ddpm_DANRA_conditional_wValid.py:679).
    """
    lr = schedule if schedule is not None else learning_rate
    name = name.lower()
    if name == "adamw":
        opt = optax.adamw(
            lr, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay
        )
    elif name == "adam":
        opt = optax.adam(lr, b1=beta1, b2=beta2, eps=eps)
    elif name == "sgd":
        opt = optax.sgd(lr)
    elif name == "lion":
        opt = optax.lion(lr, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(opt)
    if plateau_patience is not None:
        # accumulation_size averages the loss over N update calls before a
        # plateau decision, so patience counts "epochs" when N is set to
        # steps-per-epoch — matching the reference stepping the scheduler
        # once per epoch on mean train loss (ddpm…wValid.py:679).
        chain.append(
            optax.contrib.reduce_on_plateau(
                factor=plateau_factor,
                patience=plateau_patience,
                accumulation_size=max(1, plateau_accumulation),
                min_scale=plateau_min_scale,
            )
        )
    return optax.chain(*chain) if len(chain) > 1 else opt


def warmup_cosine_schedule(
    peak_lr: float,
    warmup_steps: int,
    total_steps: int,
    end_lr_ratio: float = 0.0,
) -> optax.Schedule:
    """Linear warmup then cosine decay (ImagenTrainer's warmup+cosine,
    CascadedDDPM/trainer.py:427-446)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=peak_lr * end_lr_ratio,
    )


def find_plateau_state(opt_state):
    """Locate the reduce_on_plateau state inside a (possibly MultiSteps-
    wrapped) chain, or None. Its ``.scale`` is the current LR multiplier —
    the observable the reference printed when ReduceLROnPlateau fired."""
    if hasattr(opt_state, "plateau_count") and hasattr(opt_state, "scale"):
        return opt_state
    if hasattr(opt_state, "inner_opt_state"):  # optax.MultiSteps
        return find_plateau_state(opt_state.inner_opt_state)
    if isinstance(opt_state, (tuple, list)):
        for child in opt_state:
            found = find_plateau_state(child)
            if found is not None:
                return found
    return None


__all__ = ["make_optimizer", "warmup_cosine_schedule", "find_plateau_state"]
