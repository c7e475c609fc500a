"""Evaluation: ocean-masked error metrics, CRPS, spatial statistics."""

from .fid import fid, fid_from_features, frechet_distance
from .metrics import (
    crps_ensemble,
    daily_errors,
    evaluate_fields,
    heidke_skill_score,
    masked_mae,
    masked_rmse,
    mean_bias,
    morans_i,
    peirce_skill_score,
    pixel_distribution,
    pixel_errors,
    psd_distance,
    rapsd,
)

__all__ = [
    "psd_distance",
    "rapsd",
    "fid",
    "fid_from_features",
    "frechet_distance",
    "crps_ensemble",
    "daily_errors",
    "evaluate_fields",
    "heidke_skill_score",
    "masked_mae",
    "masked_rmse",
    "mean_bias",
    "morans_i",
    "peirce_skill_score",
    "pixel_distribution",
    "pixel_errors",
]
