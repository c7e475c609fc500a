"""Frechet Inception Distance — the one metric the reference left on its
TODO list (evaluation_DANRA_conditional.py:251-257).

FID is the Frechet distance between Gaussians fitted to feature
embeddings of generated and reference samples. The canonical features
come from an InceptionV3 trained on ImageNet — meaningless for 1-channel
climate fields and unavailable in a zero-egress image — so the feature
extractor is pluggable:

* ``feature_fn=None`` uses a deterministic random-projection + nonlinearity
  feature bank (a randomly-initialized CNN is a valid FID feature space;
  random features preserve distributional distances in expectation), which
  makes the statistic reproducible and dependency-free;
* any callable (N, H, W[, C]) -> (N, D) can be passed instead — e.g. a
  trained encoder's bottleneck, or true Inception features when torch
  weights are cached.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray
) -> float:
    """d^2 = |mu1 - mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)).

    Tr(sqrt(C1 C2)) is computed from the eigenvalues of the (generally
    non-symmetric) product C1 C2 — equal to the trace of the matrix square
    root; tiny negative/imaginary parts from finite samples are clipped.
    """
    diff = mu1 - mu2
    eigvals = np.linalg.eigvals(cov1 @ cov2)
    tr_sqrt = float(np.sum(np.sqrt(np.clip(eigvals.real, 0.0, None))))
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt)


def _fit_gaussian(feats: np.ndarray):
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(cov)


def random_projection_features(
    images: np.ndarray, dim: int = 64, seed: int = 0
) -> np.ndarray:
    """Deterministic random feature bank: overlapping 8x8 patch averages
    -> random projection -> tanh. (N, H, W[, C]) -> (N, dim)."""
    x = np.asarray(images, np.float64)
    if x.ndim == 3:
        x = x[..., None]
    n, h, w, c = x.shape
    # 4x4 grid of patch means as low-level stats
    gh, gw = max(h // 4, 1), max(w // 4, 1)
    pooled = (
        x[:, : gh * 4, : gw * 4]
        .reshape(n, 4, gh, 4, gw, c)
        .mean(axis=(2, 4))
        .reshape(n, -1)
    )
    raw = np.concatenate([pooled, x.reshape(n, -1)[:, :: max((h * w * c) // 64, 1)]], 1)
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((raw.shape[1], dim)) / np.sqrt(raw.shape[1])
    lin = raw @ proj
    # linear channel is scale-equivariant (mean/scale shifts register at
    # any magnitude); tanh channel adds bounded higher-moment sensitivity
    return np.concatenate([lin[:, : dim // 2], np.tanh(lin[:, dim // 2 :])], 1)


def fid_from_features(feats_gen: np.ndarray, feats_ref: np.ndarray) -> float:
    mu1, cov1 = _fit_gaussian(np.asarray(feats_gen, np.float64))
    mu2, cov2 = _fit_gaussian(np.asarray(feats_ref, np.float64))
    return frechet_distance(mu1, cov1, mu2, cov2)


def fid(
    gen: np.ndarray,
    ref: np.ndarray,
    feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> float:
    """FID between two sample sets of fields (N, H, W[, C])."""
    feature_fn = feature_fn or random_projection_features
    return fid_from_features(feature_fn(np.asarray(gen)), feature_fn(np.asarray(ref)))


__all__ = [
    "fid",
    "fid_from_features",
    "frechet_distance",
    "random_projection_features",
]
