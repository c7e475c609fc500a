"""MNIST loading — parity with the g0 starter (DiffusionModel_MNIST.py).

The reference's first script just loads and displays MNIST via
torchvision (DiffusionModel_MNIST.py:82-98); this module reads the
classic IDX files directly (no torchvision / no network) and exposes the
batch format the rest of the framework expects. When no IDX files are
available (the zero-egress CI image), ``load_mnist`` falls back to a
deterministic synthetic digit-like dataset so the MNIST benchmark config
(BASELINE.md config #1) stays runnable.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def _read_idx(path: Path) -> np.ndarray:
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        shape = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(shape)


def _synthetic_digits(n: int, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Digit-like blobs: oriented strokes per class, deterministic."""
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, 10, n)
    imgs = np.zeros((n, 28, 28), np.float32)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    for i, label in enumerate(ys):
        angle = label * np.pi / 10.0
        cx, cy = 14 + rng.normal(0, 2), 14 + rng.normal(0, 2)
        d = np.abs(
            (xx - cx) * np.sin(angle) - (yy - cy) * np.cos(angle)
        )
        r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        imgs[i] = np.exp(-(d**2) / 4.0) * (r < 10 + label)
    return imgs[..., None], ys.astype(np.int32)


def load_mnist(
    data_dir: Optional[str] = None,
    split: str = "train",
    *,
    n_synthetic: int = 2048,
) -> Tuple[np.ndarray, np.ndarray]:
    """(images, labels): images (N, 28, 28, 1) float32 in [0, 1].

    ``data_dir`` should contain the IDX files
    (train-images-idx3-ubyte[.gz], etc.); with none present, synthetic
    digit-like data is returned (flagged by the constant filenames not
    existing — callers can check ``has_real_mnist``)."""
    if data_dir is not None and has_real_mnist(data_dir):
        prefix = "train" if split == "train" else "t10k"
        root = Path(data_dir)
        for suffix in ("", ".gz"):
            img_path = root / f"{prefix}-images-idx3-ubyte{suffix}"
            if img_path.exists():
                images = _read_idx(img_path).astype(np.float32) / 255.0
                labels = _read_idx(
                    root / f"{prefix}-labels-idx1-ubyte{suffix}"
                ).astype(np.int32)
                return images[..., None], labels
    return _synthetic_digits(n_synthetic, seed=0 if split == "train" else 1)


def has_real_mnist(data_dir) -> bool:
    root = Path(data_dir)
    return any(
        (root / f"train-images-idx3-ubyte{s}").exists() for s in ("", ".gz")
    )


__all__ = ["load_mnist", "has_real_mnist"]
