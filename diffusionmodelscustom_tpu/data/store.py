"""Chunked array store: zarr when available, a self-contained directory
store otherwise.

The reference keeps each daily field as a member of a zarr group
(``group[file_name][var]`` -> float32 array; daily_files_to_zarr.py:11-68,
data_DANRA_conditional.py:950-961). This module exposes that exact access
pattern behind ``open_group``/``create_group``: if the ``zarr`` package is
importable the real thing is used; otherwise ``DirectoryStore`` provides a
compatible subset backed by one ``.npy`` file per (member, variable) —
dependency-free and mmap-read on the hot path.

Conversion entry points mirror C12:

* ``convert_npz_to_store``  (daily_files_to_zarr.py:11-38)
* ``convert_nc_to_store``   (daily_files_to_zarr.py:40-68; requires
  netCDF4, gated)
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

try:  # pragma: no cover - zarr not installed in CI image
    import zarr  # type: ignore

    HAVE_ZARR = True
except ImportError:
    zarr = None
    HAVE_ZARR = False

_SAFE = re.compile(r"[^A-Za-z0-9_.\-]")


def _safe(name: str) -> str:
    return _SAFE.sub("_", name)


class DirectoryMember:
    """One group member (= one day); maps variable name -> array."""

    def __init__(self, path: Path, mode: str = "r"):
        self.path = path
        self.mode = mode

    def __getitem__(self, var: str) -> np.ndarray:
        f = self.path / f"{_safe(var)}.npy"
        if not f.exists():
            raise KeyError(var)
        return np.load(f, mmap_mode="r" if self.mode == "r" else None)

    def __setitem__(self, var: str, value: np.ndarray) -> None:
        if self.mode == "r":
            raise PermissionError("store opened read-only")
        self.path.mkdir(parents=True, exist_ok=True)
        np.save(self.path / f"{_safe(var)}.npy", np.asarray(value))

    def keys(self):
        return [p.stem for p in sorted(self.path.glob("*.npy"))]

    def __contains__(self, var: str) -> bool:
        return (self.path / f"{_safe(var)}.npy").exists()


class DirectoryStore:
    """Minimal group: directory of member directories of .npy variables.

    API subset of ``zarr.open_group``: ``keys()``, ``__getitem__``,
    ``create_group``-ish writes via member ``__setitem__``.
    """

    def __init__(self, path: os.PathLike, mode: str = "r"):
        self.path = Path(path)
        self.mode = mode
        if mode in ("a", "w"):
            self.path.mkdir(parents=True, exist_ok=True)
        elif not self.path.exists():
            raise FileNotFoundError(self.path)

    def keys(self) -> list[str]:
        return sorted(p.name for p in self.path.iterdir() if p.is_dir())

    def __iter__(self) -> Iterator[str]:
        return iter(self.keys())

    def __len__(self) -> int:
        return len(self.keys())

    def __contains__(self, name: str) -> bool:
        return (self.path / _safe(name)).is_dir()

    def __getitem__(self, name: str) -> DirectoryMember:
        member = DirectoryMember(self.path / _safe(name), self.mode)
        if self.mode == "r" and not member.path.exists():
            raise KeyError(name)
        return member

    def create_member(self, name: str) -> DirectoryMember:
        if self.mode == "r":
            raise PermissionError("store opened read-only")
        m = DirectoryMember(self.path / _safe(name), self.mode)
        m.path.mkdir(parents=True, exist_ok=True)
        return m


def open_group(path: os.PathLike, mode: str = "r", *, backend: Optional[str] = None):
    """Open a chunked group; zarr if available (and the path looks like a
    zarr store), else the directory store."""
    use_zarr = HAVE_ZARR if backend is None else backend == "zarr"
    if use_zarr and HAVE_ZARR:
        return zarr.open_group(str(path), mode=mode)
    return DirectoryStore(path, mode=mode)


def convert_npz_to_store(
    npz_directory: os.PathLike,
    store_path: os.PathLike,
    *,
    backend: Optional[str] = None,
) -> None:
    """Each ``.npz`` file becomes one member; every array in the archive
    becomes one variable (convert_npz_to_zarr parity,
    daily_files_to_zarr.py:11-38)."""
    group = open_group(store_path, mode="a", backend=backend)
    for fname in sorted(os.listdir(npz_directory)):
        if not fname.endswith(".npz"):
            continue
        with np.load(Path(npz_directory) / fname) as archive:
            member_name = fname
            member = (
                group.create_member(member_name)
                if isinstance(group, DirectoryStore)
                else group.require_group(member_name)
            )
            for var in archive.files:
                member[var] = np.asarray(archive[var], dtype=np.float32)


def convert_nc_to_store(
    nc_directory: os.PathLike,
    store_path: os.PathLike,
    *,
    backend: Optional[str] = None,
) -> None:
    """netCDF daily files -> store (convert_nc_to_zarr parity,
    daily_files_to_zarr.py:40-68). Requires the optional netCDF4 package."""
    try:
        import netCDF4  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "netCDF4 is required for convert_nc_to_store; install it or "
            "convert via npz"
        ) from e
    group = open_group(store_path, mode="a", backend=backend)
    for fname in sorted(os.listdir(nc_directory)):
        if not fname.endswith(".nc"):
            continue
        ds = netCDF4.Dataset(Path(nc_directory) / fname)
        member = (
            group.create_member(fname)
            if isinstance(group, DirectoryStore)
            else group.require_group(fname)
        )
        for var in ds.variables:
            member[var] = np.asarray(ds[var][:], dtype=np.float32)


def write_member(group, name: str, arrays: Dict[str, np.ndarray]) -> None:
    """Write one member with the given variables (test/synthetic helper)."""
    member = (
        group.create_member(name)
        if isinstance(group, DirectoryStore)
        else group.require_group(name)
    )
    for var, arr in arrays.items():
        member[var] = np.asarray(arr, dtype=np.float32)


__all__ = [
    "HAVE_ZARR",
    "DirectoryStore",
    "DirectoryMember",
    "open_group",
    "convert_npz_to_store",
    "convert_nc_to_store",
    "write_member",
]
