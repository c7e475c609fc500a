"""ctypes bindings for the native host-path kernels (native/dmc_host.cpp).

Provides the C++ fast path for the data pipeline's two host hotspots
(SURVEY.md hot-loop #5): the SDF distance transform and the fused
crop+resize+scale. Falls back to scipy/PIL transparently when the shared
library isn't built; build it with ``make -C native`` (the module also
attempts a one-shot build on first import if g++ is available).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_NATIVE_DIR = _REPO_ROOT / "native"
_SO_PATH = _NATIVE_DIR / "libdmc_host.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO_PATH.exists() and (_NATIVE_DIR / "dmc_host.cpp").exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not _SO_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.edt_2d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.crop_resize_scale.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
        ]
        lib.batch_crop_resize_scale.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def edt(mask: np.ndarray) -> np.ndarray:
    """Euclidean distance to the nearest True cell (0 on True cells).

    Native equivalent of ``scipy.ndimage.distance_transform_edt(~mask)``
    as used by generate_sdf (data/geo.py)."""
    lib = _load()
    m = np.ascontiguousarray(np.asarray(mask) > 0, dtype=np.uint8)
    if lib is None:
        from scipy.ndimage import distance_transform_edt

        return distance_transform_edt(~m.astype(bool)).astype(np.float32)
    h, w = m.shape
    out = np.empty((h, w), np.float32)
    lib.edt_2d(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h,
        w,
    )
    return out


def crop_resize_scale(
    src: np.ndarray,
    window: Tuple[int, int, int, int],  # (y1, y2, x1, x2)
    out_shape: Tuple[int, int],
    in_low: float = 0.0,
    in_high: float = 1.0,
    data_min: float = 0.0,
    data_max: float = 1.0,
) -> np.ndarray:
    """Fused cutout crop + bilinear resize + linear interval rescale."""
    y1, y2, x1, x2 = window
    out_h, out_w = out_shape
    scale = (in_high - in_low) / max(data_max - data_min, 1e-12)
    lib = _load()
    if lib is None:
        from PIL import Image

        crop = np.ascontiguousarray(src[y1:y2, x1:x2], np.float32)
        img = Image.fromarray(crop, mode="F").resize((out_w, out_h), Image.BILINEAR)
        return (np.asarray(img, np.float32) - data_min) * scale + in_low
    s = np.ascontiguousarray(src, np.float32)
    out = np.empty((out_h, out_w), np.float32)
    lib.crop_resize_scale(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.shape[0],
        s.shape[1],
        y1,
        x1,
        y2 - y1,
        x2 - x1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h,
        out_w,
        np.float32(data_min),
        np.float32(scale),
        np.float32(in_low),
    )
    return out


def batch_crop_resize_scale(
    sources,
    windows,
    out_shape: Tuple[int, int],
    in_low: float = 0.0,
    in_high: float = 1.0,
    data_min: float = 0.0,
    data_max: float = 1.0,
    n_threads: int = 4,
) -> np.ndarray:
    """Threaded batch of fused crop+resize+scale (one output per source).

    ``sources``: list of 2-D float32 arrays; ``windows``: list of
    (y1, y2, x1, x2). Falls back to a loop over :func:`crop_resize_scale`.
    """
    n = len(sources)
    out_h, out_w = out_shape
    lib = _load()
    if lib is None:
        return np.stack(
            [
                crop_resize_scale(
                    s, w, out_shape, in_low, in_high, data_min, data_max
                )
                for s, w in zip(sources, windows)
            ]
        )
    scale = (in_high - in_low) / max(data_max - data_min, 1e-12)
    srcs = [np.ascontiguousarray(s, np.float32) for s in sources]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for s in srcs]
    )
    src_hw = np.asarray([[s.shape[0], s.shape[1]] for s in srcs], np.int32)
    win = np.asarray(
        [[y1, x1, y2 - y1, x2 - x1] for (y1, y2, x1, x2) in windows], np.int32
    )
    out = np.empty((n, out_h, out_w), np.float32)
    lib.batch_crop_resize_scale(
        ptrs,
        src_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        win.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h,
        out_w,
        np.float32(data_min),
        np.float32(scale),
        np.float32(in_low),
        n_threads,
    )
    return out


__all__ = ["have_native", "edt", "crop_resize_scale", "batch_crop_resize_scale"]
