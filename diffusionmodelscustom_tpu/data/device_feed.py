"""Compact device feed: ship minimum bytes, rebuild geography ON DEVICE.

The reference's loader computed lsm/topo crops and a full EDT-based SDF on
the host for every sample and shipped five full-resolution fields per
batch (data_DANRA_conditional.py:1118-1190 — SURVEY.md hot-loop #5). The
rebuild's host path already batches that through native C++ kernels
(data/dataset.py load_batch); this module goes further, the TPU-native
way: the host ships ONE packed uint16 buffer per batch holding only

* the target image (crop+resize+scale on host, cast bf16),
* the conditioning image at a small feed resolution (bf16),
* the class label and the cutout coordinates (uint16),

and a jitted "finisher" — traceable INSIDE the train step — reconstructs
the full training batch on device: lsm/topo crops via vmapped
``dynamic_slice`` from resident full-domain arrays, the per-cutout SDF via
the separable-scan EDT (ops/edt.py), and the conditioning upsample. On
the remote-tunnel dev setup H2D measures ~40 ms fixed per transfer at
~45 MB/s (scripts/probe_input_r2.py) — batch bytes drop ~10x (10.5 MB ->
~1.1 MB at 128px batch 32) and land in one put; on co-located TPU hosts
it still deletes the host EDT + three field copies per batch.

Divergences from the host path (documented, tolerance-tested):
* img/cond are bf16 over the wire (~0.4% quantization; training targets
  are noise draws, so this is far below the noise floor);
* mask/cond resizes use jax.image bilinear instead of the host's
  PIL-style antialiased kernel — identical when cutout_size == data_size
  (the flagship config) and within interpolation tolerance otherwise;
* cutout windows are assumed in-bounds for the img/lsm/topo domain (the
  ``find_rand_points`` guarantee); ``dynamic_slice`` clamps like numpy
  for degenerate configs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.edt import generate_sdf, normalize_sdf

_U16_MAX = 65535


@dataclasses.dataclass(frozen=True)
class CompactSpec:
    """Static layout of the packed batch buffer (element counts in uint16).

    Fields appear in declaration order: img, img_cond?, classifier?,
    points?. All shapes are static so the unpack is jit-traceable.
    """

    batch: int
    data_size: Tuple[int, int]
    cond_size: Optional[Tuple[int, int]] = None  # None -> no cond field
    has_classifier: bool = False
    has_points: bool = False
    cutout_size: int = 0  # static crop edge for the device geo slice
    want_lsm: bool = False
    want_topo: bool = False
    want_sdf: bool = False

    def segments(self):
        b = self.batch
        h, w = self.data_size
        segs = [("img", (b, h, w, 1), jnp.bfloat16)]
        if self.cond_size is not None:
            ch, cw = self.cond_size
            segs.append(("img_cond", (b, ch, cw, 1), jnp.bfloat16))
        if self.has_classifier:
            segs.append(("classifier", (b,), jnp.int32))
        if self.has_points:
            segs.append(("points", (b, 4), jnp.int32))
        return segs

    @property
    def n_per_sample(self) -> int:
        """uint16 elements per sample (the packed buffer is
        (batch, n_per_sample) — batch-major so the data axis shards)."""
        return sum(
            int(np.prod(shape)) // self.batch
            for _, shape, _ in self.segments()
        )

    @classmethod
    def for_dataset(
        cls,
        dataset,
        batch: int,
        *,
        cond_size: Optional[Tuple[int, int]] = None,
    ) -> "CompactSpec":
        """Derive the spec from a DanraDataset's config (the same flags
        load_batch keys its output on)."""
        cfg = dataset.cfg
        # geo fields exist only on the cutout path (mirrors load_batch's
        # "if cfg.cutouts and geo_fields" host gating): without cutout
        # points there is nothing to reconstruct
        cutouts = bool(cfg.cutouts)
        return cls(
            batch=batch,
            data_size=tuple(cfg.data_size),
            cond_size=(
                tuple(cond_size or cfg.data_size)
                if cfg.conditional_images
                else None
            ),
            has_classifier=bool(cfg.conditional_seasons),
            has_points=cutouts,
            cutout_size=int(cfg.cutout_size or cfg.data_size[0]),
            want_lsm=cutouts and dataset.lsm_full is not None,
            want_topo=cutouts and dataset.topo_full is not None,
            want_sdf=bool(
                cutouts
                and cfg.sdf_weighted_loss
                and dataset.lsm_full is not None
            ),
        )


def pack_compact(batch: Dict[str, np.ndarray], spec: CompactSpec) -> np.ndarray:
    """Host side: pack the compact batch into one (batch, n_per_sample)
    uint16 buffer — batch-major, so sharding axis 0 on a mesh's ``data``
    axis keeps every sample's bytes on one device.

    bf16 payloads are viewed as uint16 (same-width view, no bitcast
    ambiguity on device); int32 labels/coords must fit in uint16 (class
    counts <= 366 and domain edges <= 65535 in every DANRA config).
    """
    import ml_dtypes

    parts = []
    b = spec.batch
    for name, shape, dtype in spec.segments():
        arr = np.asarray(batch[name])
        if arr.shape != shape:
            raise ValueError(f"{name}: expected {shape}, got {arr.shape}")
        if dtype == jnp.bfloat16:
            parts.append(
                np.ascontiguousarray(arr, dtype=ml_dtypes.bfloat16)
                .view(np.uint16)
                .reshape(b, -1)
            )
        else:
            ints = np.ascontiguousarray(arr)
            if ints.min() < 0 or ints.max() > int(_U16_MAX):
                raise ValueError(f"{name}: values outside uint16 range")
            parts.append(ints.astype(np.uint16).reshape(b, -1))
    return np.concatenate(parts, axis=1)


def unpack_compact(buf: jnp.ndarray, spec: CompactSpec) -> Dict[str, jnp.ndarray]:
    """Device side (jit-traceable): static column slices + same-width
    bitcasts on the (batch, n_per_sample) buffer."""
    out = {}
    offset = 0
    for name, shape, dtype in spec.segments():
        n = int(np.prod(shape)) // spec.batch
        seg = jax.lax.slice_in_dim(buf, offset, offset + n, axis=1)
        offset += n
        if dtype == jnp.bfloat16:
            out[name] = jax.lax.bitcast_convert_type(seg, jnp.bfloat16).reshape(
                shape
            )
        else:
            out[name] = seg.astype(jnp.int32).reshape(shape)
    return out


def _resize_nhwc(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    if x.shape[1:3] == tuple(size):
        return x
    from ..ops.resize import resize_image

    return resize_image(x, size[0], size[1], method="bilinear")


class DeviceGeoFinisher:
    """Jit-traceable batch reconstruction from a packed compact buffer.

    Holds the full-domain lsm/topo as device-resident constants (shipped
    once at construction) and mirrors the host semantics field by field:

    * lsm/topo: crop the cutout window, resize to data_size
      (data/dataset.py load_batch geo path);
    * sdf: EDT-SDF of the CROPPED mask, per-window min-max normalize,
      then resize — the reference's exact per-cutout order
      (generate_sdf(lsm_use), data_DANRA_conditional.py:834-836);
    * img_cond: upsample the feed-resolution field to data_size;
    * img: bf16 -> f32 passthrough (host already crop/resize/scaled).
    """

    def __init__(
        self,
        spec: CompactSpec,
        *,
        lsm_full: Optional[np.ndarray] = None,
        topo_full: Optional[np.ndarray] = None,
    ):
        self.spec = spec
        need_geo = spec.want_lsm or spec.want_topo or spec.want_sdf
        if need_geo and not spec.has_points:
            raise ValueError("geo reconstruction requires cutout points")
        self.lsm_full = (
            jnp.asarray(np.asarray(lsm_full, np.float32).squeeze())
            if lsm_full is not None
            else None
        )
        self.topo_full = (
            jnp.asarray(np.asarray(topo_full, np.float32).squeeze())
            if topo_full is not None
            else None
        )
        if spec.want_lsm or spec.want_sdf:
            assert self.lsm_full is not None, "lsm_full required"
        if spec.want_topo:
            assert self.topo_full is not None, "topo_full required"

    def _crops(self, full: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
        cs = self.spec.cutout_size

        def one(p):
            return jax.lax.dynamic_slice(full, (p[0], p[2]), (cs, cs))

        return jax.vmap(one)(points)  # (B, cs, cs)

    def __call__(self, buf: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        spec = self.spec
        parts = unpack_compact(buf, spec)
        batch: Dict[str, jnp.ndarray] = {
            "img": parts["img"].astype(jnp.float32)
        }
        if "classifier" in parts:
            batch["classifier"] = parts["classifier"]
        if "img_cond" in parts:
            batch["img_cond"] = _resize_nhwc(
                parts["img_cond"].astype(jnp.float32), spec.data_size
            )
        if spec.want_lsm or spec.want_sdf:
            lsm_crop = self._crops(self.lsm_full, parts["points"])
            if spec.want_lsm:
                batch["lsm"] = _resize_nhwc(
                    lsm_crop[..., None], spec.data_size
                )
            if spec.want_sdf:
                sdf = normalize_sdf(generate_sdf(lsm_crop))
                batch["sdf"] = _resize_nhwc(sdf[..., None], spec.data_size)
        if spec.want_topo:
            topo_crop = self._crops(self.topo_full, parts["points"])
            batch["topo"] = _resize_nhwc(topo_crop[..., None], spec.data_size)
        return batch


class CompactBatcher:
    """Host-side producer: light load_batch (no geo fields, feed-res cond)
    -> one packed uint16 buffer per batch."""

    def __init__(
        self,
        dataset,
        batch: int,
        *,
        cond_size: Optional[Tuple[int, int]] = None,
        pool=None,
    ):
        self.dataset = dataset
        self.spec = CompactSpec.for_dataset(dataset, batch, cond_size=cond_size)
        self._cond_size = (
            tuple(cond_size) if cond_size is not None else None
        )
        self._pool = pool

    def load(self, indices) -> np.ndarray:
        batch = self.dataset.load_batch(
            indices,
            self._pool,
            geo_fields=False,
            cond_size=self._cond_size,
        )
        return pack_compact(batch, self.spec)

    def make_finisher(self) -> DeviceGeoFinisher:
        return DeviceGeoFinisher(
            self.spec,
            lsm_full=self.dataset.lsm_full,
            topo_full=self.dataset.topo_full,
        )


def make_compact_train_step(trainer, finisher: DeviceGeoFinisher):
    """Jit one fused (unpack + geo reconstruct + train) step: the packed
    buffer is the only per-step H2D payload, and XLA schedules the
    reconstruction alongside the model step.

    Equivalent to ``Trainer(..., batch_finisher=finisher).train_step``;
    if the trainer was already built with a batch_finisher, that step IS
    the fused step — return it rather than applying the finisher twice.
    """
    if getattr(trainer, "_batch_finisher", None) is not None:
        return trainer.train_step

    def step(state, buf, rng):
        return trainer._train_step_impl(state, finisher(buf), rng)

    return jax.jit(step, donate_argnums=(0,))


__all__ = [
    "CompactSpec",
    "CompactBatcher",
    "DeviceGeoFinisher",
    "pack_compact",
    "unpack_compact",
    "make_compact_train_step",
]
