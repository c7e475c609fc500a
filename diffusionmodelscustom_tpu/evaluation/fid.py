"""Frechet Inception Distance — the one metric the reference left on its
TODO list (evaluation_DANRA_conditional.py:251-257).

FID is the Frechet distance between Gaussians fitted to feature
embeddings of generated and reference samples. The canonical features
come from an InceptionV3 trained on ImageNet — meaningless for 1-channel
climate fields and unavailable in a zero-egress image — so the feature
extractor is pluggable:

* ``feature_fn=None`` uses a small fixed-weight CNN whose weights are
  SHIPPED IN-REPO (``fid_weights.npz``), so FID values are stable across
  runs and machines (a randomly-initialized CNN is a valid FID feature
  space; freezing one set of weights makes the statistic a constant of
  the codebase rather than of the process);
* ``random_projection_features`` remains as the dependency-light
  fallback;
* any callable (N, H, W[, C]) -> (N, D) can be passed instead — e.g. a
  trained encoder's bottleneck, or true Inception features when torch
  weights are cached.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np

_WEIGHTS_FILE = Path(__file__).parent / "fid_weights.npz"


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


def make_feature_net_weights(seed: int = 7, path: Optional[Path] = None) -> dict:
    """Generate (and optionally persist) the fixed feature-net weights.

    Three stride-2 conv layers 1->16->32->64 with He-scaled filters. Run
    once to create ``fid_weights.npz``; the committed file — not this
    function — defines the metric."""
    rng = np.random.default_rng(seed)

    def he(shape):
        fan_in = int(np.prod(shape[:-1]))
        return (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(
            np.float32
        )

    weights = {
        "conv1": he((5, 5, 1, 16)),
        "conv2": he((3, 3, 16, 32)),
        "conv3": he((3, 3, 32, 64)),
    }
    if path is not None:
        np.savez(path, **weights)
    return weights


_CNN_CACHE: dict = {}


def _conv2d_stride2_same(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """NHWC stride-2 SAME conv in pure numpy (float64 accumulation).

    Deterministic on every machine and backend — the feature extractor
    must NOT run through a compiler whose numerics depend on the device
    (an earlier jitted version produced ~0.2% FID drift between the TPU
    and CPU backends, which dominates small FID values)."""
    kh, kw, cin, cout = w.shape
    n, h, ww, _ = x.shape
    oh, ow = -(-h // 2), -(-ww // 2)
    pad_h = max((oh - 1) * 2 + kh - h, 0)
    pad_w = max((ow - 1) * 2 + kw - ww, 0)
    xp = np.pad(
        x,
        (
            (0, 0),
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
            (0, 0),
        ),
    )
    win = np.lib.stride_tricks.sliding_window_view(xp, (kh, kw), axis=(1, 2))
    win = win[:, ::2, ::2]  # (n, oh, ow, cin, kh, kw)
    win = win.transpose(0, 1, 2, 4, 5, 3).reshape(n, oh, ow, kh * kw * cin)
    return win @ w.reshape(kh * kw * cin, cout)


def pretrained_cnn_features(
    images: np.ndarray, weights_path: Optional[Path] = None
) -> np.ndarray:
    """Fixed-weight CNN features: (N, H, W[, C]) -> (N, 128).

    Multi-channel inputs are averaged to one channel (climate fields are
    single-variable); each conv is stride-2 with ReLU; the head is global
    mean+std pooling over the last feature map (128 dims). Weights load
    once from the in-repo ``fid_weights.npz``; the forward pass is pure
    numpy so values do not depend on the active JAX backend."""
    weights_path = Path(weights_path or _WEIGHTS_FILE)
    key = str(weights_path)
    if key not in _CNN_CACHE:
        with np.load(weights_path) as z:
            _CNN_CACHE[key] = {k: np.asarray(z[k], np.float64) for k in z.files}
    w = _CNN_CACHE[key]
    x = np.asarray(images, np.float64)
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] != 1:
        x = x.mean(axis=-1, keepdims=True)
    for name in ("conv1", "conv2", "conv3"):
        x = np.maximum(_conv2d_stride2_same(x, w[name]), 0.0)
    return np.concatenate([x.mean(axis=(1, 2)), x.std(axis=(1, 2))], axis=-1)


def fid_from_features(feats_gen: np.ndarray, feats_ref: np.ndarray) -> float:
    mu1, cov1 = _fit_gaussian(np.asarray(feats_gen, np.float64))
    mu2, cov2 = _fit_gaussian(np.asarray(feats_ref, np.float64))
    return frechet_distance(mu1, cov1, mu2, cov2)


def fid(
    gen: np.ndarray,
    ref: np.ndarray,
    feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> float:
    """FID between two sample sets of fields (N, H, W[, C]).

    Defaults to the in-repo fixed-weight CNN features when the shipped
    weights file exists (stable, comparable values); otherwise the
    random-projection bank."""
    if feature_fn is None:
        feature_fn = (
            pretrained_cnn_features
            if _WEIGHTS_FILE.exists()
            else random_projection_features
        )
    return fid_from_features(feature_fn(np.asarray(gen)), feature_fn(np.asarray(ref)))


__all__ = [
    "fid",
    "fid_from_features",
    "frechet_distance",
    "random_projection_features",
    "pretrained_cnn_features",
    "make_feature_net_weights",
]
