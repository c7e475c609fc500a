"""Synthetic DANRA-like climate fields for tests and benchmarks.

The reference's only runnable data is the author's private DANRA/ERA5
archive; to make every pipeline testable (and the benchmark harness
self-contained) this module fabricates statistically plausible
temperature-like fields: smooth Gaussian random fields with a seasonal
mean cycle, a coastline-shaped land-sea mask, and correlated topography.
File naming follows the reference's ``*_YYYYMMDD`` convention so the
season classifier (data/geo.py DateFromFile) works unchanged.
"""

from __future__ import annotations

import datetime
from typing import Optional, Tuple

import numpy as np

from .store import open_group, write_member


def gaussian_random_field(
    rng: np.random.Generator,
    shape: Tuple[int, int],
    correlation_length: float = 8.0,
) -> np.ndarray:
    """Smooth random field via spectral filtering of white noise."""
    h, w = shape
    noise = rng.standard_normal((h, w))
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    spectrum = np.exp(-((fx**2 + fy**2) * (correlation_length**2) * 4.0))
    field = np.fft.ifft2(np.fft.fft2(noise) * spectrum).real
    field = field / max(field.std(), 1e-9)
    return field.astype(np.float32)


def synthetic_geography(
    shape: Tuple[int, int], seed: int = 7
) -> Tuple[np.ndarray, np.ndarray]:
    """(lsm, topo) full-domain fields: a smooth random 'coastline' mask and
    elevation positively correlated with land."""
    rng = np.random.default_rng(seed)
    base = gaussian_random_field(rng, shape, correlation_length=12.0)
    lsm = (base > -0.1).astype(np.float32)
    topo = np.maximum(base + 0.1, 0.0) * lsm * 800.0
    return lsm, topo.astype(np.float32)


def synthetic_temperature(
    rng: np.random.Generator,
    shape: Tuple[int, int],
    day_of_year: int,
    lsm: Optional[np.ndarray] = None,
) -> np.ndarray:
    """One day's 2m-temperature-like field in Kelvin (the stores keep
    Kelvin; datasets subtract 273.15 like the reference,
    data_DANRA_conditional.py:346-347)."""
    seasonal = 8.0 * np.cos(2.0 * np.pi * (day_of_year - 200) / 365.0)
    field = gaussian_random_field(rng, shape, correlation_length=6.0) * 4.0
    t_celsius = 8.0 + seasonal + field
    if lsm is not None:
        t_celsius = t_celsius + 2.0 * (lsm - 0.5)  # land/sea contrast
    return (t_celsius + 273.15).astype(np.float32)


def make_synthetic_store(
    path,
    *,
    n_days: int = 16,
    shape: Tuple[int, int] = (128, 128),
    start: str = "20000101",
    variable: str = "t",
    lowres_factor: Optional[int] = None,
    seed: int = 0,
    lsm: Optional[np.ndarray] = None,
):
    """Write a store of daily members named ``t2m_ave_YYYYMMDD`` holding
    ``variable`` fields; with ``lowres_factor`` the fields are
    block-averaged to mimic the ERA5 low-res conditioning archive."""
    group = open_group(path, mode="a")
    d0 = datetime.date(int(start[:4]), int(start[4:6]), int(start[6:8]))
    rng = np.random.default_rng(seed)
    for i in range(n_days):
        day = d0 + datetime.timedelta(days=i)
        doy = day.timetuple().tm_yday
        field = synthetic_temperature(rng, shape, doy, lsm)
        if lowres_factor:
            f = lowres_factor
            h, w = shape[0] // f, shape[1] // f
            field = field[: h * f, : w * f].reshape(h, f, w, f).mean(axis=(1, 3))
            field = field.astype(np.float32)
        name = f"t2m_ave_{day.strftime('%Y%m%d')}.npz"
        # the DANRA archive stores (1, 1, H, W) 't' arrays
        # (data_DANRA_conditional.py:1148-1151); low-res uses flat 'arr_0'
        if lowres_factor:
            write_member(group, name, {"arr_0": field})
        else:
            write_member(group, name, {variable: field[None, None]})
    return group


__all__ = [
    "gaussian_random_field",
    "synthetic_geography",
    "synthetic_temperature",
    "make_synthetic_store",
]
