"""Geospatial preprocessing: land-sea masks, topography, SDFs, dates, crops.

Rebuild of the reference's C11 inventory (SURVEY.md):

* ``preprocess_lsm_topography`` — load + optional flip + topo [0,1]
  normalize + resize to target (data_DANRA_conditional.py:20-80).
* ``generate_sdf`` / ``normalize_sdf`` — signed-distance field from the
  land mask: 10*mask - EDT(sea), min-max normalized
  (data_DANRA_conditional.py:82-102). The euclidean distance transform
  runs on the host via scipy; the framework *precomputes* SDFs for crop
  domains at pipeline startup instead of per sample (the reference ran
  EDT inside ``__getitem__`` for every sample — SURVEY.md hot-loop #5).
* ``DateFromFile`` — YYYYMMDD filename -> season / month / day-of-year
  class label (data_DANRA_conditional.py:104-153).
* ``Scale`` — linear interval rescaling transform
  (data_DANRA_conditional.py:158-191).
* ``find_rand_points`` — random fixed-size crop inside a domain rectangle
  (data_DANRA_conditional.py:375-401).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
from scipy.ndimage import distance_transform_edt


def generate_sdf(mask: np.ndarray) -> np.ndarray:
    """SDF = 10*land_mask - distance_to_land_over_sea (reference formula,
    data_DANRA_conditional.py:82-92). Uses the native C++ EDT when built
    (native/dmc_host.cpp), scipy otherwise."""
    binary = np.asarray(mask) > 0
    from .native import edt, have_native

    if have_native():
        dist_sea = edt(binary)
    else:
        dist_sea = distance_transform_edt(~binary)
    return 10.0 * binary.astype(np.float32) - dist_sea.astype(np.float32)


def generate_signed_sdf(mask: np.ndarray) -> np.ndarray:
    """Alternate fully-signed SDF: EDT over sea minus EDT over land
    (the experiment in DDPM_DANRA_conditional/sdf_lsm_map.py:33-50)."""
    binary = np.asarray(mask) > 0
    from .native import edt, have_native

    if have_native():
        dist_to_land = edt(binary)
        dist_to_sea = edt(~binary)
    else:
        dist_to_land = distance_transform_edt(~binary)
        dist_to_sea = distance_transform_edt(binary)
    return (dist_to_sea - dist_to_land).astype(np.float32)


def normalize_sdf(sdf: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0, 1] (data_DANRA_conditional.py:94-102)."""
    lo, hi = float(np.min(sdf)), float(np.max(sdf))
    if hi == lo:
        return np.zeros_like(sdf, dtype=np.float32)
    return ((sdf - lo) / (hi - lo)).astype(np.float32)


def _resize2d(arr: np.ndarray, target: Tuple[int, int]) -> np.ndarray:
    """Antialiased bilinear resize on the host (the torchvision
    ``Resize(antialias=True)`` role). Uses simple area-style averaging for
    downscale and bilinear for upscale via jax.image on CPU-free numpy."""
    from PIL import Image

    h, w = target
    img = Image.fromarray(np.asarray(arr, dtype=np.float32), mode="F")
    return np.asarray(img.resize((w, h), Image.BILINEAR), dtype=np.float32)


def preprocess_lsm_topography(
    lsm_path,
    topo_path,
    target_size: Tuple[int, int],
    scale: bool = False,
    flip: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load lsm/topo npz fields, optionally flip and [0,1]-normalize topo,
    resize to target (data_DANRA_conditional.py:20-53). Returns (lsm,
    topo) as (H, W, 1) float32 arrays (NHWC channel-last)."""
    lsm = np.load(lsm_path)["data"]
    topo = np.load(topo_path)["data"]
    if flip:
        lsm = np.flipud(lsm).copy()
        topo = np.flipud(topo).copy()
    return preprocess_lsm_topography_from_data(lsm, topo, target_size, scale)


def preprocess_lsm_topography_from_data(
    lsm_data: np.ndarray,
    topo_data: np.ndarray,
    target_size: Tuple[int, int],
    scale: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """In-memory variant (data_DANRA_conditional.py:55-80)."""
    lsm = np.asarray(lsm_data, np.float32)
    topo = np.asarray(topo_data, np.float32)
    if scale:
        topo = (topo - topo.min()) / max(topo.max() - topo.min(), 1e-12)
    lsm = _resize2d(lsm, target_size)
    topo = _resize2d(topo, target_size)
    return lsm[..., None], topo[..., None]


@dataclasses.dataclass
class DateFromFile:
    """Date parsing from a ``*YYYYMMDD`` filename stem
    (data_DANRA_conditional.py:104-153)."""

    filename: str

    def __post_init__(self):
        stem = self.filename.split(".")[0]
        self.year = int(stem[-8:-4])
        self.month = int(stem[-4:-2])
        self.day = int(stem[-2:])

    def determine_season(self) -> int:
        # MAM=0, JJA=1, SON=2, DJF=3
        if self.month in (3, 4, 5):
            return 0
        if self.month in (6, 7, 8):
            return 1
        if self.month in (9, 10, 11):
            return 2
        return 3

    def determine_month(self) -> int:
        return self.month - 1

    @staticmethod
    def is_leap_year(year: int) -> bool:
        return (year % 4 == 0 and year % 100 != 0) or (year % 400 == 0)

    def determine_day(self) -> int:
        common = [0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
        leap = [0, 31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
        days = leap if self.is_leap_year(self.year) else common
        return sum(days[: self.month]) + self.day - 1

    def classify(self, n_classes: int) -> int:
        """Dispatch used by the datasets (4 -> season, 12 -> month,
        366 -> day of year; data_DANRA_conditional.py:1127-1147)."""
        if n_classes == 4:
            return self.determine_season()
        if n_classes == 12:
            return self.determine_month()
        if n_classes == 366:
            return self.determine_day()
        raise ValueError("n_classes must be 4, 12 or 366")


@dataclasses.dataclass
class Scale:
    """Linear rescale from [data_min_in, data_max_in] to [in_low, in_high]
    (data_DANRA_conditional.py:158-191)."""

    in_low: float
    in_high: float
    data_min_in: float
    data_max_in: float

    def __call__(self, data: np.ndarray) -> np.ndarray:
        old_range = self.data_max_in - self.data_min_in
        new_range = self.in_high - self.in_low
        return ((data - self.data_min_in) * new_range) / old_range + self.in_low

    def inverse(self, data: np.ndarray) -> np.ndarray:
        """Back-transform generated samples to physical units."""
        old_range = self.data_max_in - self.data_min_in
        new_range = self.in_high - self.in_low
        return (data - self.in_low) * old_range / new_range + self.data_min_in


def find_rand_points(
    rect: Sequence[int], crop_dim: int, rng: Optional[np.random.Generator] = None
) -> list[int]:
    """Random crop_dim-sized window [x1, x2, y1, y2] inside rect
    (data_DANRA_conditional.py:375-401); functional RNG instead of the
    global ``random`` module."""
    rng = rng or np.random.default_rng()
    x1, x2, y1, y2 = rect
    a_x = (x2 - x1) - crop_dim
    a_y = (y2 - y1) - crop_dim
    assert a_x >= 0 and a_y >= 0, "crop larger than domain"
    x_rand = int(rng.integers(0, a_x + 1))
    y_rand = int(rng.integers(0, a_y + 1))
    x1n = x1 + x_rand
    y1n = y1 + y_rand
    return [x1n, x1n + crop_dim, y1n, y1n + crop_dim]


__all__ = [
    "generate_sdf",
    "generate_signed_sdf",
    "normalize_sdf",
    "preprocess_lsm_topography",
    "preprocess_lsm_topography_from_data",
    "DateFromFile",
    "Scale",
    "find_rand_points",
]
