"""Exact Euclidean distance transform on device (batched, jit/scan-safe).

The reference computed a full-domain scipy EDT inside its data loader for
every crop (data_DANRA_conditional.py:82-92 via :834-836) — SURVEY.md
hot-loop #5, the pipeline that killed its training throughput. The rebuild
already moved the EDT to a native C++ host kernel (native/dmc_host.cpp);
this module moves it ONTO THE CHIP, so the input pipeline only ships the
crop coordinates and the image bytes — the geography-derived channels
(lsm/topo crops, per-cutout SDF) are reconstructed on device from resident
full-domain arrays. On the remote-tunnel dev setup H2D measures ~37 MB/s
(scripts/probe_input_r2.py), so every byte not shipped is throughput; on
real co-located TPU hosts it still removes the loader's EDT latency
entirely.

Algorithm — separable exact EDT (the classic two-pass decomposition):

1. column pass: per column, distance (in rows) to the nearest True via a
   forward and a backward ``lax.scan`` (O(H));
2. row pass: D^2[i,j] = min_{j'} ((j-j')^2 + g[i,j']^2) — a min-plus
   reduction over the row, evaluated in W-chunks inside a scan so the
   (W x W) broadcast never materializes at batch scale (O(W^2) work, VPU
   element ops — ~67M ops for a (32,128,128) batch, microseconds on TPU).

This gives exactly ``scipy.ndimage.distance_transform_edt(~mask)``
(distance to the nearest True cell) for grids with at least one True;
all-False grids return the CAP value (the host paths never see this case
because land cutouts always contain land; normalize_sdf maps a constant
field to zeros just like the host implementation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_CAP = 1e4  # finite stand-in for "no seed in grid"


def _column_distance(mask: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) bool -> per-column vertical distance to nearest True."""
    big = jnp.asarray(_CAP, jnp.float32)

    def fwd(carry, row):
        d = jnp.where(row, 0.0, carry + 1.0)
        d = jnp.minimum(d, big)
        return d, d

    init = jnp.full(mask.shape[:-2] + mask.shape[-1:], big, jnp.float32)
    rows = jnp.moveaxis(mask, -2, 0)  # (H, ..., W)
    _, down = jax.lax.scan(fwd, init, rows)
    _, up = jax.lax.scan(fwd, init, rows[::-1])
    g = jnp.minimum(down, up[::-1])
    return jnp.moveaxis(g, 0, -2)  # (..., H, W)


@functools.partial(jax.jit, static_argnames=("chunk",))
def edt(mask: jnp.ndarray, chunk: int = 32) -> jnp.ndarray:
    """Distance to the nearest True cell of ``mask`` (..., H, W) -> f32.

    Matches ``scipy.ndimage.distance_transform_edt(~mask)`` exactly on
    grids containing at least one True.
    """
    mask = mask.astype(bool)
    g = _column_distance(mask)  # (..., H, W)
    w = mask.shape[-1]
    g2 = g * g
    cols = jnp.arange(w, dtype=jnp.float32)

    # scan over source-column chunks, carrying the running min of
    # (j - j')^2 + g[..., j']^2
    n_chunks = -(-w // chunk)
    pad = n_chunks * chunk - w
    g2p = jnp.pad(g2, [(0, 0)] * (g2.ndim - 1) + [(0, pad)],
                  constant_values=_CAP * _CAP)
    srcp = jnp.pad(cols, (0, pad), constant_values=-_CAP)
    g2c = jnp.stack(jnp.split(g2p, n_chunks, axis=-1))  # (n, ..., H, chunk)
    srcc = jnp.stack(jnp.split(srcp, n_chunks))  # (n, chunk)

    def body(best, chunk_in):
        g2_k, src_k = chunk_in
        # (..., H, W, chunk): target col j vs source col j'
        d2 = (cols[:, None] - src_k[None, :]) ** 2 + g2_k[..., None, :]
        return jnp.minimum(best, jnp.min(d2, axis=-1)), None

    best0 = jnp.full(g2.shape, _CAP * _CAP, jnp.float32)
    best, _ = jax.lax.scan(body, best0, (g2c, srcc))
    return jnp.sqrt(jnp.minimum(best, _CAP * _CAP))


def generate_sdf(mask: jnp.ndarray) -> jnp.ndarray:
    """Device mirror of data.geo.generate_sdf: 10*mask - EDT-to-land
    (reference formula, data_DANRA_conditional.py:82-92)."""
    binary = mask > 0
    return 10.0 * binary.astype(jnp.float32) - edt(binary)


def normalize_sdf(sdf: jnp.ndarray) -> jnp.ndarray:
    """Device mirror of data.geo.normalize_sdf: per-field min-max to
    [0, 1]; constant fields -> zeros (data_DANRA_conditional.py:94-102).
    Normalizes over the trailing (H, W) axes per batch element."""
    lo = jnp.min(sdf, axis=(-2, -1), keepdims=True)
    hi = jnp.max(sdf, axis=(-2, -1), keepdims=True)
    rng = hi - lo
    return jnp.where(rng > 0, (sdf - lo) / jnp.where(rng > 0, rng, 1.0), 0.0)


__all__ = ["edt", "generate_sdf", "normalize_sdf"]
