"""Dataset splitting: random or temporal train/valid/test partitions.

The reference exposes ``data_split_type`` ('random') with
``{'train_size': 0.8, 'val_size': 0.1, 'test_size': 0.1}``
(test/launch.py:59-61) but also ships date-partitioned zarr groups
(train/valid/test stores, ddpm_DANRA_conditional_wValid.py:113-119).
Both strategies are provided here over a single store.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def split_files(
    files: Sequence[str],
    *,
    split_type: str = "random",
    train_size: float = 0.8,
    val_size: float = 0.1,
    test_size: float = 0.1,
    seed: int = 0,
) -> Dict[str, List[str]]:
    """Partition member names into train/valid/test.

    ``random`` shuffles before splitting; ``temporal`` keeps file order
    (names carry YYYYMMDD dates, so this is a chronological split that
    avoids train/test leakage across adjacent days at the boundaries).
    """
    total = train_size + val_size + test_size
    assert abs(total - 1.0) < 1e-6, f"split fractions must sum to 1, got {total}"
    files = list(files)
    if split_type == "random":
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(files))
        files = [files[i] for i in order]
    elif split_type != "temporal":
        raise ValueError(f"unknown split_type {split_type!r}")
    n = len(files)
    n_train = int(round(n * train_size))
    n_val = int(round(n * val_size))
    return {
        "train": files[:n_train],
        "valid": files[n_train : n_train + n_val],
        "test": files[n_train + n_val :],
    }


__all__ = ["split_files"]
