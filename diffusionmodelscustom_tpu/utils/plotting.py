"""Figure utilities: sample grids and loss curves.

Rebuild of the reference's matplotlib reporting — per-epoch generated
sample grids (ddpm_DANRA_conditional_wValid.py:627-656), loss-curve plots
(:663-670), the pickled loss lists read back by loss_examination.py:12-30
(JSON here), and the clean app's plot helpers (src/plot_utils.py).
Matplotlib is imported lazily with the Agg backend so headless
training never needs a display.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_sample_grid(
    samples: np.ndarray,
    path,
    *,
    titles: Optional[Sequence[str]] = None,
    ncols: int = 4,
    cmap: str = "RdBu_r",
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
) -> None:
    """Grid of generated fields (the per-epoch figure at
    ddpm_DANRA_conditional_wValid.py:627-656)."""
    plt = _plt()
    samples = np.asarray(samples)
    if samples.ndim == 4:
        samples = samples[..., 0]
    n = samples.shape[0]
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(3 * ncols, 3 * nrows), squeeze=False
    )
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        ax.axis("off")
        if i < n:
            im = ax.imshow(samples[i], cmap=cmap, vmin=vmin, vmax=vmax)
            if titles is not None and i < len(titles):
                ax.set_title(str(titles[i]), fontsize=8)
    fig.colorbar(im, ax=axes.ravel().tolist(), shrink=0.6)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def save_loss_curves(history: Dict[str, Sequence[float]], path) -> None:
    """Loss curves + a sidecar JSON (replaces the reference's pickled
    loss lists, ddpm_DANRA_conditional_wValid.py:672-675)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, values in history.items():
        if values:
            ax.plot(values, label=name)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.legend()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    Path(path).with_suffix(".json").write_text(
        json.dumps({k: list(map(float, v)) for k, v in history.items()})
    )


def load_loss_history(path) -> Dict[str, list]:
    """Read back a loss-history JSON (loss_examination.py:12-30 role)."""
    return json.loads(Path(path).with_suffix(".json").read_text())


def compare_loss_curves(histories: Dict[str, Dict[str, Sequence[float]]], path) -> None:
    """Overlay train losses from multiple runs (loss_examination.py role)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 4))
    for run_name, history in histories.items():
        values = history.get("train_loss", [])
        if values:
            ax.plot(values, label=run_name)
    ax.set_xlabel("epoch")
    ax.set_ylabel("train loss")
    ax.set_yscale("log")
    ax.legend(fontsize=8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


__all__ = [
    "save_sample_grid",
    "save_loss_curves",
    "load_loss_history",
    "compare_loss_curves",
]
