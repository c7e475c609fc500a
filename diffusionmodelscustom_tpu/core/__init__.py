"""Core diffusion math: schedules, discrete/continuous processes, losses."""

from .schedules import (
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    cosine_beta_schedule,
    cosine_ramp_beta_schedule,
    karras_sigma_schedule,
    linear_beta_schedule,
    log_snr_to_alpha_sigma,
    make_beta_schedule,
    right_pad_dims_to,
)
from .continuous import ContinuousDiffusion, dynamic_threshold
from .ddpm import GaussianDiffusion
from .edm import EDMConfig
from .flow import RectifiedFlow, make_process
from .losses import (
    classifier_free_guidance,
    get_loss,
    hybrid_loss,
    huber_loss,
    l1_loss,
    min_snr_weight,
    sdf_weighted_mse,
    simple_loss,
)

__all__ = [
    "ContinuousDiffusion",
    "EDMConfig",
    "GaussianDiffusion",
    "RectifiedFlow",
    "dynamic_threshold",
    "alpha_cosine_log_snr",
    "beta_linear_log_snr",
    "classifier_free_guidance",
    "cosine_beta_schedule",
    "cosine_ramp_beta_schedule",
    "get_loss",
    "hybrid_loss",
    "huber_loss",
    "karras_sigma_schedule",
    "l1_loss",
    "linear_beta_schedule",
    "log_snr_to_alpha_sigma",
    "make_beta_schedule",
    "make_process",
    "min_snr_weight",
    "right_pad_dims_to",
    "sdf_weighted_mse",
    "simple_loss",
]
