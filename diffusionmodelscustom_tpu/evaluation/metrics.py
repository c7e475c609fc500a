"""Evaluation metrics for generated climate fields.

Implements the reference's evaluation protocol
(DDPM_DANRA_conditional/evaluation_DANRA_conditional.py):

* ocean masking via the land-sea mask (:93-96);
* daily (per-sample) and pixel-wise MAE/RMSE over land pixels (:121-133);
* pixel-value distributions and mean bias (:164-179);

plus the metrics the reference left as TODOs (:251-257 "FID, Heidke/
Pierce skill scores, EV analysis, spatial/temporal bias"):

* CRPS (ensemble form, the standard probabilistic skill score for this
  downscaling task);
* Moran's I spatial autocorrelation (scaffolded-but-commented in the
  reference at :182-192, implemented here with rook contiguity weights);
* Heidke and Peirce skill scores for thresholded events.

All functions take channel-last numpy/jax arrays; masks are boolean with
True = land (included).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _maskify(x: np.ndarray, mask: Optional[np.ndarray]) -> np.ma.MaskedArray:
    x = np.asarray(x, np.float64)
    if mask is None:
        return np.ma.masked_invalid(x)
    mask = np.broadcast_to(np.asarray(mask, bool), x.shape)
    return np.ma.masked_array(x, mask=~mask)


def masked_mae(gen: np.ndarray, ref: np.ndarray, mask=None) -> float:
    """Mean |gen - ref| over unmasked (land) pixels (nan if all masked)."""
    d = _maskify(gen, mask) - _maskify(ref, mask)
    if d.count() == 0:
        return float("nan")
    return float(np.ma.mean(np.ma.abs(d)))


def masked_rmse(gen: np.ndarray, ref: np.ndarray, mask=None) -> float:
    d = _maskify(gen, mask) - _maskify(ref, mask)
    if d.count() == 0:
        return float("nan")
    return float(np.sqrt(np.ma.mean(d**2)))


def daily_errors(
    gen: np.ndarray, ref: np.ndarray, mask=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-sample (MAE, RMSE) arrays, land-masked
    (evaluation_DANRA_conditional.py:121-127)."""
    n = gen.shape[0]
    mae = np.empty(n)
    rmse = np.empty(n)
    for i in range(n):
        m = mask[i] if (mask is not None and np.ndim(mask) == gen.ndim) else mask
        mae[i] = masked_mae(gen[i], ref[i], m)
        rmse[i] = masked_rmse(gen[i], ref[i], m)
    return mae, rmse


def pixel_errors(
    gen: np.ndarray, ref: np.ndarray, mask=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pixel (MAE, RMSE) maps over the sample axis
    (evaluation_DANRA_conditional.py:128-133)."""
    g = _maskify(gen, mask)
    r = _maskify(ref, mask)
    d = g - r
    return (
        np.ma.mean(np.ma.abs(d), axis=0).filled(np.nan),
        np.ma.sqrt(np.ma.mean(d**2, axis=0)).filled(np.nan),
    )


def mean_bias(gen: np.ndarray, ref: np.ndarray, mask=None) -> float:
    """Mean(gen) - mean(ref) over land
    (evaluation_DANRA_conditional.py:164-179)."""
    return float(np.ma.mean(_maskify(gen, mask)) - np.ma.mean(_maskify(ref, mask)))


def pixel_distribution(
    x: np.ndarray, mask=None, bins: int = 100, range_=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Histogram of unmasked pixel values (density)."""
    vals = _maskify(x, mask).compressed()
    hist, edges = np.histogram(vals, bins=bins, range=range_, density=True)
    return hist, edges


def crps_ensemble(
    ensemble: np.ndarray, observation: np.ndarray, mask=None
) -> float:
    """Continuous ranked probability score, fair-ensemble estimator.

    CRPS = E|X - y| - 0.5 E|X - X'| averaged over unmasked pixels.
    ``ensemble``: (M, ...) member axis first; ``observation``: (...).
    (One of the reference's planned-but-missing metrics,
    evaluation_DANRA_conditional.py:251-257.)
    """
    ens = np.asarray(ensemble, np.float64)
    obs = np.asarray(observation, np.float64)
    m = ens.shape[0]
    term1 = np.mean(np.abs(ens - obs[None]), axis=0)
    # pairwise member spread
    spread = np.zeros_like(obs)
    for i in range(m):
        spread = spread + np.sum(np.abs(ens[i] - ens[i + 1 :]), axis=0)
    term2 = spread * 2.0 / (m * (m - 1)) if m > 1 else np.zeros_like(obs)
    crps = term1 - 0.5 * term2
    return float(np.ma.mean(_maskify(crps, mask)))


def morans_i(field: np.ndarray, mask=None) -> float:
    """Moran's I with rook-contiguity weights on the grid.

    I = (N/W) * sum_ij w_ij z_i z_j / sum_i z_i^2 over unmasked cells
    (the reference scaffolded this with esda/pysal and commented it out,
    evaluation_DANRA_conditional.py:182-192).
    """
    f = np.asarray(field, np.float64).squeeze()
    assert f.ndim == 2, "morans_i expects one (H, W) field"
    valid = (
        np.broadcast_to(np.asarray(mask, bool).squeeze(), f.shape)
        if mask is not None
        else np.ones_like(f, bool)
    )
    if valid.sum() < 2:
        return 0.0
    z = np.where(valid, f - f[valid].mean(), 0.0)
    num = 0.0
    w_sum = 0.0
    # rook neighbours: right and down (each pair counted twice -> x2)
    for dy, dx in ((0, 1), (1, 0)):
        a = z[: f.shape[0] - dy, : f.shape[1] - dx]
        b = z[dy:, dx:]
        va = valid[: f.shape[0] - dy, : f.shape[1] - dx]
        vb = valid[dy:, dx:]
        pair_valid = va & vb
        num += 2.0 * np.sum(a * b * pair_valid)
        w_sum += 2.0 * np.sum(pair_valid)
    denom = np.sum(z[valid] ** 2)
    n = valid.sum()
    if denom == 0 or w_sum == 0:
        return 0.0
    return float(n / w_sum * num / denom)


def rapsd(field: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Radially-averaged power spectral density of one (H, W) field.

    The standard second-order texture statistic for climate-field
    generation (used to diagnose exactly the oversmoothing/over-sharpening
    tradeoffs Moran's I summarizes to one number): 2-D periodogram,
    averaged over annular bins of integer radial wavenumber. Returns
    (wavenumbers, psd) with the DC bin excluded. One of the reference's
    planned-but-missing second-order metrics
    (evaluation_DANRA_conditional.py:251-257 lists only first-order
    bias/EV items — PSD closes the texture gap its TODO list leaves).

    PSD is computed on the FULL field (no ocean mask): the FFT needs a
    complete grid, and masking would alias the coastline into every
    wavenumber.
    """
    f = np.asarray(field, np.float64).squeeze()
    assert f.ndim == 2, "rapsd expects one (H, W) field"
    h, w = f.shape
    psd2 = np.abs(np.fft.fft2(f)) ** 2 / (h * w)
    ky = np.fft.fftfreq(h) * h
    kx = np.fft.fftfreq(w) * w
    k = np.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)
    kmax = int(min(h, w) // 2)
    kbin = np.clip(np.rint(k).astype(int), 0, None)
    sums = np.bincount(kbin.ravel(), weights=psd2.ravel(), minlength=kmax + 1)
    counts = np.bincount(kbin.ravel(), minlength=kmax + 1)
    radial = sums[1 : kmax + 1] / np.maximum(counts[1 : kmax + 1], 1)
    return np.arange(1, kmax + 1, dtype=np.float64), radial


def psd_distance(gen: np.ndarray, truth: np.ndarray) -> float:
    """Log-spectral distance between ensemble-mean radial power spectra.

    mean_k |log10 PSD_gen(k) - log10 PSD_truth(k)| over radial wavenumbers,
    with each side's PSD first averaged over the sample axis. 0 = the
    generated fields carry the truth's power at every spatial scale;
    oversmoothing shows as missing high-k power, few-step residual noise
    as excess high-k power. Complements the random-feature FID
    (`evaluation/fid.py`) with a physically-interpretable texture
    statistic (round-3 VERDICT item 4).
    """
    gen = np.asarray(gen, np.float64).reshape(-1, *np.asarray(gen).shape[-2:])
    truth = np.asarray(truth, np.float64).reshape(
        -1, *np.asarray(truth).shape[-2:]
    )
    pg = np.mean([rapsd(g)[1] for g in gen], axis=0)
    pt = np.mean([rapsd(t)[1] for t in truth], axis=0)
    eps = 1e-20
    return float(
        np.mean(np.abs(np.log10(pg + eps) - np.log10(pt + eps)))
    )


def _contingency(
    gen: np.ndarray, ref: np.ndarray, threshold: float, mask=None
) -> Tuple[float, float, float, float]:
    g = _maskify(gen, mask)
    r = _maskify(ref, mask)
    valid = ~np.ma.getmaskarray(g)
    ge = (np.asarray(g) >= threshold) & valid
    re = (np.asarray(r) >= threshold) & valid
    a = float(np.sum(ge & re))  # hits
    b = float(np.sum(ge & ~re & valid))  # false alarms
    c = float(np.sum(~ge & valid & re))  # misses
    d = float(np.sum(~ge & ~re & valid))  # correct negatives
    return a, b, c, d


def heidke_skill_score(
    gen: np.ndarray, ref: np.ndarray, threshold: float, mask=None
) -> float:
    """HSS for exceedance events (reference TODO metric)."""
    a, b, c, d = _contingency(gen, ref, threshold, mask)
    denom = (a + c) * (c + d) + (a + b) * (b + d)
    if denom == 0:
        return 0.0
    return float(2.0 * (a * d - b * c) / denom)


def peirce_skill_score(
    gen: np.ndarray, ref: np.ndarray, threshold: float, mask=None
) -> float:
    """PSS (true skill statistic) for exceedance events."""
    a, b, c, d = _contingency(gen, ref, threshold, mask)
    denom = (a + c) * (b + d)
    if denom == 0:
        return 0.0
    return float((a * d - b * c) / denom)


def spatial_bias(gen: np.ndarray, ref: np.ndarray, mask=None) -> np.ndarray:
    """Per-pixel mean bias map (H, W) — 'bias per pixel (spatial bias)'
    from the reference's planned-metrics list
    (evaluation_DANRA_conditional.py:251-257). Masked pixels are NaN."""
    diff = np.asarray(gen, np.float64) - np.asarray(ref, np.float64)
    out = diff.mean(axis=0)
    if mask is not None:
        m = np.asarray(mask)
        m2d = m if m.ndim == 2 else m.reshape(m.shape[0], *m.shape[1:]).mean(0) > 0.5
        out = np.where(np.asarray(m2d, bool), out, np.nan)
    return out


def temporal_bias(gen: np.ndarray, ref: np.ndarray, mask=None) -> np.ndarray:
    """Per-sample mean bias series (N,) — 'bias per image (temporal
    bias)'."""
    diff = _maskify(
        np.asarray(gen, np.float64) - np.asarray(ref, np.float64), mask
    )
    return np.asarray(diff.reshape(diff.shape[0], -1).mean(axis=1))


def extreme_value_stats(
    x: np.ndarray,
    mask=None,
    quantiles=(0.9, 0.95, 0.99, 0.999),
) -> Dict[str, float]:
    """Upper-tail return levels — the 'EV analysis' item from the
    reference's planned-metrics list. Returns {q<percentile>: level} plus
    the block maxima mean (per-sample max, the GEV location proxy)."""
    vals = _maskify(np.asarray(x, np.float64), mask)
    flat = vals.compressed() if np.ma.isMaskedArray(vals) else np.ravel(vals)
    out = {f"q{q}": float(np.quantile(flat, q)) for q in quantiles}
    per_sample_max = (
        vals.reshape(vals.shape[0], -1).max(axis=1)
        if x.ndim >= 3
        else np.max(flat, keepdims=True)
    )
    out["block_maxima_mean"] = float(np.mean(per_sample_max))
    return out


def evaluate_fields(
    gen: np.ndarray,
    ref: np.ndarray,
    lsm: Optional[np.ndarray] = None,
    *,
    event_threshold: Optional[float] = None,
    morans_max_fields: Optional[int] = None,
) -> Dict[str, float]:
    """Full scorecard over a (N, H, W[, C]) generated-vs-truth pair —
    the single-call equivalent of the reference's evaluation script.

    Moran's I is averaged over ALL fields by default;
    ``morans_max_fields`` caps the count for very large sets (an earlier
    undocumented cap of 16 added sampling variance of the same order as
    the parity gaps being judged)."""
    mask = (np.asarray(lsm) > 0.5) if lsm is not None else None
    daily_mae, daily_rmse = daily_errors(gen, ref, mask)
    out = {
        "mae": masked_mae(gen, ref, mask),
        "rmse": masked_rmse(gen, ref, mask),
        "bias": mean_bias(gen, ref, mask),
        # nanmean: cutout windows that are entirely ocean contribute no
        # daily statistic instead of poisoning the mean
        "daily_mae_mean": float(np.nanmean(daily_mae)),
        "daily_rmse_mean": float(np.nanmean(daily_rmse)),
        "morans_i_gen": float(
            np.mean(
                [morans_i(gen[i], mask[i] if np.ndim(mask) == gen.ndim else mask)
                 for i in range(
                     len(gen) if morans_max_fields is None
                     else min(len(gen), morans_max_fields))]
            )
        ),
        "morans_i_ref": float(
            np.mean(
                [morans_i(ref[i], mask[i] if np.ndim(mask) == ref.ndim else mask)
                 for i in range(
                     len(ref) if morans_max_fields is None
                     else min(len(ref), morans_max_fields))]
            )
        ),
    }
    if event_threshold is not None:
        out["heidke"] = heidke_skill_score(gen, ref, event_threshold, mask)
        out["peirce"] = peirce_skill_score(gen, ref, event_threshold, mask)
    return out


__all__ = [
    "masked_mae",
    "spatial_bias",
    "temporal_bias",
    "extreme_value_stats",
    "masked_rmse",
    "daily_errors",
    "pixel_errors",
    "mean_bias",
    "pixel_distribution",
    "crps_ensemble",
    "morans_i",
    "rapsd",
    "psd_distance",
    "heidke_skill_score",
    "peirce_skill_score",
    "evaluate_fields",
]
