"""Statistical parity validation against the reference's ground-truth
output artifacts.

The only reference outputs that exist are the npz bundles under
``DDPM_DANRA_conditional/final_generated_samples/`` — 5 trained model
variants x {gen, eval, lsm, cond, season, point} x 100 samples @64x64
(written by generation_DANRA_conditional.py:431-441). This module loads
those bundles, computes the evaluation scorecard the reference's
evaluation script defines (evaluation_DANRA_conditional.py:121-179, ocean
masking :93-96) plus the distribution-distance metrics it left as TODOs,
and exposes the reference-gen-vs-reference-truth numbers as the yardstick
a rebuilt model must land inside.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from .metrics import crps_ensemble, evaluate_fields, psd_distance


def _masked_values(x: np.ndarray, lsm: Optional[np.ndarray]) -> np.ndarray:
    """Flat vector of land-pixel values (ocean masking per
    evaluation_DANRA_conditional.py:93-96); all pixels when no mask."""
    x = np.asarray(x, np.float64)
    if lsm is None:
        return x.ravel()
    return x[np.asarray(lsm) > 0.5].ravel()

REFERENCE_SAMPLES_DIR = Path(
    "/root/reference/DDPM_DANRA_conditional/final_generated_samples"
)

# the 5 model variants x the 6 per-variant arrays (file-name stems)
_KINDS = ("gen", "eval", "lsm", "cond", "season", "point")


def _variant_of(filename: str) -> str:
    """'gen_samples__DDPM_conditional_ERA5__temp__...' -> the experiment id
    between the first and last double-underscore groups."""
    stem = filename.split("_samples__", 1)[1]
    return stem.rsplit("__", 1)[0]  # strip trailing '100_samples'


def load_reference_bundles(
    directory: Path | str = REFERENCE_SAMPLES_DIR,
) -> Dict[str, Dict[str, Optional[np.ndarray]]]:
    """Group the npz artifacts by model variant.

    Returns {variant: {gen, eval, lsm, cond, season, point}} with arrays
    squeezed to (N, H, W) ((N,) for season); entries whose npz holds a
    pickled None (the unconditional variants' cond/season files) are None.
    """
    directory = Path(directory)
    bundles: Dict[str, Dict[str, Optional[np.ndarray]]] = {}
    for f in sorted(directory.glob("*_samples__*.npz")):
        kind = f.name.split("_samples__", 1)[0]
        if kind not in _KINDS:
            continue
        variant = _variant_of(f.name)
        arr = np.load(f, allow_pickle=True)["arr_0"]
        if arr.dtype == object:  # pickled None for unused conditioning
            value = None
        else:
            value = np.squeeze(arr)
        bundles.setdefault(variant, {})[kind] = value
    return bundles


def parity_scorecard(
    gen: np.ndarray,
    truth: np.ndarray,
    lsm: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Scorecard for a generated-vs-truth pair of (N, H, W) fields.

    evaluate_fields covers the reference's implemented metrics (masked
    MAE/RMSE/bias, daily stats, Moran's I); this adds the distribution-
    level comparisons the brief demands: Wasserstein-1 and KS distance
    between the ocean-masked pixel-value distributions, distribution
    moments, CRPS of the generated ensemble against the truth mean field,
    and the fraction of generated pixels outside the physical range
    spanned by the truth (a calibration tripwire — the reference's own
    samples reach hundreds of degrees).
    """
    gen = np.squeeze(np.asarray(gen, np.float64))
    truth = np.squeeze(np.asarray(truth, np.float64))
    card = evaluate_fields(gen, truth, lsm)

    gv = _masked_values(gen, lsm)
    tv = _masked_values(truth, lsm)
    card.update(
        gen_mean=float(gv.mean()),
        gen_std=float(gv.std()),
        truth_mean=float(tv.mean()),
        truth_std=float(tv.std()),
        wasserstein1=_wasserstein1(gv, tv),
        ks=_ks_distance(gv, tv),
        crps=float(crps_ensemble(gen, truth.mean(axis=0))),
        psd_dist=psd_distance(gen, truth),
        frac_outside_truth_range=float(
            np.mean((gv < tv.min() - 5.0) | (gv > tv.max() + 5.0))
        ),
    )
    return card


def _wasserstein1(a: np.ndarray, b: np.ndarray, n: int = 2048) -> float:
    """W1 via quantile matching (dependency-free scipy.stats equivalent)."""
    qs = np.linspace(0.0, 1.0, n)
    return float(np.mean(np.abs(np.quantile(a, qs) - np.quantile(b, qs))))


def _ks_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample Kolmogorov-Smirnov statistic."""
    grid = np.sort(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), grid, side="right") / a.size
    cb = np.searchsorted(np.sort(b), grid, side="right") / b.size
    return float(np.max(np.abs(ca - cb)))


def reference_yardstick(
    directory: Path | str = REFERENCE_SAMPLES_DIR,
) -> Dict[str, Dict[str, float]]:
    """Scorecard of every reference variant's gen vs its truth fields —
    the distributional regime a rebuilt model must match or beat."""
    out = {}
    for variant, b in load_reference_bundles(directory).items():
        if b.get("gen") is None or b.get("eval") is None:
            continue
        out[variant] = parity_scorecard(b["gen"], b["eval"], b.get("lsm"))
    return out


__all__ = [
    "REFERENCE_SAMPLES_DIR",
    "load_reference_bundles",
    "parity_scorecard",
    "reference_yardstick",
]
