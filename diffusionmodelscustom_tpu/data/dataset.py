"""DANRA dataset family: store-backed samples with random domain cutouts.

One configurable dataset replaces the reference's four generations
(DANRA_Dataset / _cutouts / _cutouts_ERA5 / _cutouts_ERA5_Zarr,
data_DANRA_conditional.py:195-1236). Semantics preserved:

* per-day members keyed by ``*YYYYMMDD`` names; variable 't' (temperature,
  Kelvin -> Celsius via -273.15) or 'tp' (precipitation)
  (data_DANRA_conditional.py:1148-1167);
* season/month/day-of-year class label from the filename
  (data_DANRA_conditional.py:1127-1147);
* low-res conditioning image from a second store, or the sample-mean
  "uniform" image when none is given
  (data_DANRA_conditional.py:1152-1166);
* random fixed-size cutouts from a domain rectangle, with lsm/topo crops
  and an SDF for the weighted loss (data_DANRA_conditional.py:1171-1190);
* resize + linear Scale transform (data_DANRA_conditional.py:1031-1042);
* dict samples with the reference's keys:
  {'img','classifier','img_cond','lsm','sdf','topo','points'}
  (data_DANRA_conditional.py:1177-1228).

TPU-first changes: channel-last (H, W, 1) numpy arrays; a plain in-process
LRU-ish cache replaces the unsynchronized ``multiprocessing.Manager``
dict (SURVEY.md section 5.2); SDFs for cutout windows run the EDT on the
CROPPED mask exactly as the reference does (generate_sdf(lsm_use),
data_DANRA_conditional.py:834-836) — through the native C++ EDT when
built — with the 10*mask-minus-distance formula applied before the
per-window min-max normalization (data_DANRA_conditional.py:82-102).
"""

from __future__ import annotations

import dataclasses
import re
import warnings
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from .geo import DateFromFile, Scale, find_rand_points, generate_sdf, normalize_sdf
from .store import open_group

_MEMBER_DATE_RE = re.compile(r"(\d{8})(?:\.\w+)?$")


def _member_date(name: str) -> Optional[str]:
    """Trailing YYYYMMDD of a member name (optionally before an
    extension), or None for undated stores."""
    m = _MEMBER_DATE_RE.search(name)
    return m.group(1) if m else None


def _pair_by_date(
    files: List[str], files_cond: List[str]
) -> Tuple[List[str], List[str]]:
    """Pair image/conditioning members by their trailing YYYYMMDD date.

    The reference builds date-matched archives out-of-band (it prints and
    drops the asymmetric date difference,
    generation_DANRA_conditional.py:66-88) and then pairs positionally;
    pairing by date here makes a single missing day in one store drop
    ONE pair instead of silently misaligning every pair after the gap.
    Positional pairing (with a truncation warning) remains the fallback
    for undated member names."""
    d_img = {d: f for f in files if (d := _member_date(f)) is not None}
    d_cond = {d: f for f in files_cond if (d := _member_date(f)) is not None}
    if len(d_img) == len(files) and len(d_cond) == len(files_cond):
        common = sorted(set(d_img) & set(d_cond))
        dropped = (len(files) - len(common)) + (len(files_cond) - len(common))
        if dropped:
            warnings.warn(
                f"image/conditioning stores share only {len(common)} dates "
                f"({dropped} unmatched members dropped)",
                stacklevel=3,
            )
        return [d_img[d] for d in common], [d_cond[d] for d in common]
    if len(files) != len(files_cond):
        warnings.warn(
            "undated store members paired positionally with truncation "
            f"({len(files)} image vs {len(files_cond)} conditioning "
            "members) — pairs after any gap may be misaligned",
            stacklevel=3,
        )
    n = min(len(files), len(files_cond))
    return files[:n], files_cond[:n]


def _scaled_window(
    point: Sequence[int],
    src_hw: Tuple[int, ...],
    dst_hw: Tuple[int, ...],
) -> Tuple[int, int, int, int]:
    """Map a cutout window from the image grid to a conditioning grid of
    a different resolution over the SAME geographic domain. Identity when
    the grids match (the reference's contract: its ERA5 conditioning is
    pre-regridded to the DANRA grid and indexed with the same point,
    data_DANRA_conditional.py:1155-1160)."""
    x1, x2, y1, y2 = point
    sh, sw = src_hw[:2]
    dh, dw = dst_hw[:2]
    if (sh, sw) == (dh, dw):
        return (x1, x2, y1, y2)
    rx, ry = dh / sh, dw / sw
    nx1 = min(int(round(x1 * rx)), dh - 1)
    ny1 = min(int(round(y1 * ry)), dw - 1)
    nx2 = min(max(nx1 + 1, int(round(x2 * rx))), dh)
    ny2 = min(max(ny1 + 1, int(round(y2 * ry))), dw)
    return (nx1, nx2, ny1, ny2)


def _resize2d(arr: np.ndarray, target: Tuple[int, int]) -> np.ndarray:
    if arr.shape == tuple(target):
        return np.asarray(arr, np.float32)
    from .native import crop_resize_scale, have_native

    if have_native():
        # identity rescale; the fused kernel antialiases like PIL
        return crop_resize_scale(
            np.asarray(arr, np.float32),
            (0, arr.shape[0], 0, arr.shape[1]),
            tuple(target),
            0.0,
            1.0,
            0.0,
            1.0,
        )
    from PIL import Image

    h, w = target
    img = Image.fromarray(np.ascontiguousarray(arr, dtype=np.float32), mode="F")
    return np.asarray(img.resize((w, h), Image.BILINEAR), dtype=np.float32)


@dataclasses.dataclass
class DanraDatasetConfig:
    """Config surface of the dataset family (ddpm_DANRA_conditional_wValid
    .py:280-332 constructor args)."""

    variable: str = "temp"  # 'temp' | 'prcp'
    data_size: Tuple[int, int] = (64, 64)
    cache_size: int = 0
    scale: bool = True
    in_low: float = -1.0
    in_high: float = 1.0
    data_min_in: float = -30.0
    data_max_in: float = 30.0
    conditional_seasons: bool = False
    conditional_images: bool = False
    n_classes: Optional[int] = None
    cutouts: bool = False
    cutout_domains: Optional[Sequence[int]] = None  # [x1, x2, y1, y2]
    cutout_size: Optional[int] = None  # defaults to data_size[0]
    n_samples: Optional[int] = None
    # raw full-domain day-field cache entries (img + cond each); at DANRA
    # full-domain size (589x789 f32 ~ 1.9 MB/field) 1024 entries ~ 1.9 GB
    # per kind — size to the host
    field_cache_entries: int = 1024
    sdf_weighted_loss: bool = False
    shuffle: bool = False
    seed: int = 0


class DanraDataset:
    """Map-style dataset over a chunked store (zarr or directory store).

    ``__getitem__`` returns the reference's dict sample with channel-last
    float32 arrays ready to collate into NHWC batches.
    """

    def __init__(
        self,
        data_store_path,
        config: DanraDatasetConfig,
        *,
        cond_store_path=None,
        lsm_full_domain: Optional[np.ndarray] = None,
        topo_full_domain: Optional[np.ndarray] = None,
        members: Optional[Sequence[str]] = None,
    ):
        self.cfg = config
        self.group = open_group(data_store_path, mode="r")
        self.files = list(self.group.keys())
        self.cond_group = None
        if cond_store_path is not None:
            self.cond_group = open_group(cond_store_path, mode="r")
            files_cond = list(self.cond_group.keys())
            self.files, self.files_cond = _pair_by_date(self.files, files_cond)
        else:
            self.files_cond = self.files
        if members is not None:
            # train/valid/test partitions (data/splits.py split_files)
            keep = set(members)
            pairs = [
                (f, fc)
                for f, fc in zip(self.files, self.files_cond)
                if f in keep
            ]
            assert pairs, "members selects no store entries"
            self.files = [f for f, _ in pairs]
            self.files_cond = [fc for _, fc in pairs]

        rng = np.random.default_rng(config.seed)
        if config.shuffle:
            perm = rng.permutation(len(self.files))
            self.files = [self.files[i] for i in perm]
            self.files_cond = [self.files_cond[i] for i in perm]
        if config.n_samples is not None:
            # with cutouts the dataset may repeat files to reach n_samples
            # (data_DANRA_conditional.py:1001-1025)
            if config.cutouts and config.n_samples > len(self.files):
                factor = -(-config.n_samples // len(self.files))
                self.files = (self.files * factor)[: config.n_samples]
                self.files_cond = (self.files_cond * factor)[: config.n_samples]
            else:
                self.files = self.files[: config.n_samples]
                self.files_cond = self.files_cond[: config.n_samples]

        self.lsm_full = (
            np.asarray(lsm_full_domain, np.float32)
            if lsm_full_domain is not None
            else None
        )
        self.topo_full = (
            np.asarray(topo_full_domain, np.float32)
            if topo_full_domain is not None
            else None
        )
        # SDFs are computed PER CUTOUT WINDOW on the cropped mask — the
        # reference's exact semantics (generate_sdf(lsm_use),
        # data_DANRA_conditional.py:834-836): distances are to land INSIDE
        # the window only. (Earlier rounds cropped one precomputed
        # full-domain EDT — cheaper but it disagrees wherever the nearest
        # land lies outside the crop.) The per-window EDT routes through
        # the native C++ kernel when built; a 128x128 window costs ~us.
        # Like the reference, 'sdf' is only emitted on the cutout path.
        self.scaler = (
            Scale(config.in_low, config.in_high, config.data_min_in, config.data_max_in)
            if config.scale
            else None
        )
        self._rng = rng
        self._cache: OrderedDict[int, Dict[str, np.ndarray]] = OrderedDict()
        # raw full-domain day fields (converted, f32-contiguous): repeated
        # epochs re-read every day; profiling showed per-access np.load /
        # memmap open + Kelvin conversion dominating the loader
        self._field_cache: OrderedDict[tuple, np.ndarray] = OrderedDict()
        self._field_cache_size = max(0, config.field_cache_entries)
        # guards the shared rng and the cache so threaded loaders
        # (BatchLoader num_workers > 1) can fetch samples concurrently —
        # the thread-safe replacement for the reference's unsynchronized
        # Manager().dict() cache (data_DANRA_conditional.py:1027-1069)
        import threading

        self._lock = threading.Lock()

    # -- helpers -----------------------------------------------------------


    def _want_sdf(self) -> bool:
        return self.cfg.sdf_weighted_loss and self.lsm_full is not None

    def _window_sdf(self, x1: int, x2: int, y1: int, y2: int) -> np.ndarray:
        """Reference-parity per-cutout SDF: EDT of the cropped mask
        (generate_sdf(lsm_use), data_DANRA_conditional.py:834-836)."""
        return generate_sdf(self.lsm_full[x1:x2, y1:y2])

    def __len__(self) -> int:
        return len(self.files)

    def name(self, idx: int) -> str:
        return self.files[idx]

    def _transform(self, arr: np.ndarray) -> np.ndarray:
        out = _resize2d(arr, self.cfg.data_size)
        if self.scaler is not None:
            out = self.scaler(out)
        return out[..., None]  # (H, W, 1)

    def _field_cached(self, key: tuple, produce):
        with self._lock:
            if key in self._field_cache:
                self._field_cache.move_to_end(key)
                return self._field_cache[key]
        value = np.ascontiguousarray(produce(), np.float32)
        if self._field_cache_size > 0:
            with self._lock:
                if len(self._field_cache) >= self._field_cache_size:
                    self._field_cache.popitem(last=False)
                self._field_cache[key] = value
        return value

    def _load_image(self, file_name: str) -> np.ndarray:
        return self._field_cached(("img", file_name), lambda: self._read_image(file_name))

    def _read_image(self, file_name: str) -> np.ndarray:
        member = self.group[file_name]
        if self.cfg.variable == "temp":
            var = "t" if "t" in member else "data"
            img = np.asarray(member[var], np.float32)
            img = img.reshape(img.shape[-2:]) - 273.15
        elif self.cfg.variable == "prcp":
            var = "tp" if "tp" in member else "data"
            img = np.asarray(member[var], np.float32)
            img = img.reshape(img.shape[-2:])
        else:
            raise ValueError(f"unknown variable {self.cfg.variable!r}")
        return img

    def _load_cond(self, file_name_cond: str, img: np.ndarray) -> np.ndarray:
        if self.cond_group is None:
            # uniform conditioning depends on the (cached) img only
            return np.full_like(img, float(np.mean(img)))
        return self._field_cached(
            ("cond", file_name_cond), lambda: self._read_cond(file_name_cond)
        )

    def _read_cond(self, file_name_cond: str) -> np.ndarray:
        # the uniform-conditioning (no cond store) case is handled by
        # _load_cond before reaching here (data_DANRA_conditional.py:1122-1139)
        member = self.cond_group[file_name_cond]
        var = "arr_0" if "arr_0" in member else list(member.keys())[0]
        arr = np.asarray(member[var], np.float32)
        arr = arr.reshape(arr.shape[-2:])
        if self.cfg.variable == "temp":
            arr = arr - 273.15
        return arr

    # -- main --------------------------------------------------------------

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        with self._lock:
            if idx in self._cache:
                return self._cache[idx]
        cfg = self.cfg
        file_name = self.files[idx]
        sample: Dict[str, np.ndarray] = {}

        if cfg.conditional_seasons:
            assert cfg.n_classes is not None, "n_classes required for labels"
            sample["classifier"] = np.asarray(
                DateFromFile(file_name).classify(cfg.n_classes), np.int32
            )

        img = self._load_image(file_name)
        img_cond = (
            self._load_cond(self.files_cond[idx], img)
            if cfg.conditional_images
            else None
        )

        if cfg.cutouts:
            assert cfg.cutout_domains is not None, "cutout_domains required"
            crop = cfg.cutout_size or cfg.data_size[0]
            with self._lock:
                point = find_rand_points(cfg.cutout_domains, crop, self._rng)
            x1, x2, y1, y2 = point
            if img_cond is not None:
                # map the window onto the conditioning grid (identity on
                # the reference's same-grid archives)
                cx1, cx2, cy1, cy2 = _scaled_window(
                    point, img.shape, img_cond.shape
                )
                img_cond = img_cond[cx1:cx2, cy1:cy2]
            img = img[x1:x2, y1:y2]
            if self.lsm_full is not None:
                sample["lsm"] = self._transform_mask(self.lsm_full[x1:x2, y1:y2])
            if self.topo_full is not None:
                sample["topo"] = self._transform_mask(self.topo_full[x1:x2, y1:y2])
            if self._want_sdf():
                sdf = normalize_sdf(self._window_sdf(x1, x2, y1, y2))
                sample["sdf"] = self._transform_mask(sdf)
            sample["points"] = np.asarray(point, np.int32)

        sample["img"] = self._transform(img)
        if img_cond is not None:
            sample["img_cond"] = self._transform(img_cond)

        if cfg.cache_size > 0:
            with self._lock:
                if len(self._cache) >= cfg.cache_size:
                    self._cache.popitem(last=False)
                self._cache[idx] = sample
        return sample

    def load_batch(
        self,
        indices: Sequence[int],
        pool=None,
        *,
        geo_fields: bool = True,
        cond_size: Optional[Tuple[int, int]] = None,
    ) -> Dict[str, np.ndarray]:
        """Batched fast path: store reads fan out over ``pool`` (a
        ThreadPoolExecutor) and every field's crop+resize+scale runs as ONE
        native threaded call (native/dmc_host.cpp batch_crop_resize_scale)
        instead of per-sample Python — the replacement for the reference's
        per-sample netCDF read + PIL resize hot loop
        (data_DANRA_conditional.py:1118-1190).

        ``geo_fields=False`` skips the host lsm/topo/sdf production (the
        compact device feed reconstructs them ON DEVICE from resident
        full-domain arrays — data/device_feed.py); ``cond_size`` ships the
        conditioning image at a smaller feed resolution (the device
        finisher upsamples), cutting H2D bytes on remote-tunnel setups.
        """
        from .native import batch_crop_resize_scale

        cfg = self.cfg
        n = len(indices)
        names = [self.files[i] for i in indices]

        if pool is not None:
            imgs = list(pool.map(self._load_image, names))
            conds = (
                list(
                    pool.map(
                        self._load_cond,
                        [self.files_cond[i] for i in indices],
                        imgs,
                    )
                )
                if cfg.conditional_images
                else None
            )
        else:
            imgs = [self._load_image(nm) for nm in names]
            conds = (
                [
                    self._load_cond(self.files_cond[i], im)
                    for i, im in zip(indices, imgs)
                ]
                if cfg.conditional_images
                else None
            )

        if cfg.cutouts:
            assert cfg.cutout_domains is not None, "cutout_domains required"
            crop = cfg.cutout_size or cfg.data_size[0]
            with self._lock:
                points = [
                    find_rand_points(cfg.cutout_domains, crop, self._rng)
                    for _ in range(n)
                ]
            # cutout coords apply to every full-domain field (the
            # reference indexes img and cond with the same point,
            # data_DANRA_conditional.py:1155-1160); conditioning stores
            # on a coarser grid get the window rescaled by the grid
            # ratio (_scaled_window, identity for same-grid archives)
            # and every window is clamped to its source's bounds —
            # unclamped pointers read out of bounds in the native kernel
            def clamp(p, src):
                h0, w0 = src.shape
                x1 = min(p[0], h0 - 1)
                y1 = min(p[2], w0 - 1)
                return (x1, max(min(p[1], h0), x1 + 1),
                        y1, max(min(p[3], w0), y1 + 1))

            windows = [clamp(p, im) for p, im in zip(points, imgs)]
            cond_windows = (
                [
                    clamp(_scaled_window(p, im.shape, cn.shape), cn)
                    for p, im, cn in zip(points, imgs, conds)
                ]
                if conds is not None
                else None
            )
        else:
            points = [(0, im.shape[0], 0, im.shape[1]) for im in imgs]
            windows = [tuple(p) for p in points]
            # non-cutout conds may live on their own (lower-res) grid
            cond_windows = (
                [(0, c.shape[0], 0, c.shape[1]) for c in conds]
                if conds is not None
                else None
            )

        def batched(srcs, wins, scale: bool, target=None):
            kw = (
                dict(
                    in_low=cfg.in_low,
                    in_high=cfg.in_high,
                    data_min=cfg.data_min_in,
                    data_max=cfg.data_max_in,
                )
                if (scale and self.scaler is not None)
                else {}
            )
            return batch_crop_resize_scale(
                srcs, wins, target or cfg.data_size, n_threads=8, **kw
            )[..., None]

        batch: Dict[str, np.ndarray] = {"img": batched(imgs, windows, True)}
        if conds is not None:
            batch["img_cond"] = batched(conds, cond_windows, True, cond_size)
        if cfg.conditional_seasons:
            assert cfg.n_classes is not None
            batch["classifier"] = np.asarray(
                [DateFromFile(nm).classify(cfg.n_classes) for nm in names],
                np.int32,
            )
        if cfg.cutouts and geo_fields:
            if self.lsm_full is not None:
                wins = [clamp(p, self.lsm_full) for p in points]
                batch["lsm"] = batched([self.lsm_full] * n, wins, False)
            if self.topo_full is not None:
                wins = [clamp(p, self.topo_full) for p in points]
                batch["topo"] = batched([self.topo_full] * n, wins, False)
            if self._want_sdf():
                # per-window min-max normalize before resize (exact match
                # of the per-sample path)
                crops = [
                    normalize_sdf(self._window_sdf(x1, x2, y1, y2))
                    for (x1, x2, y1, y2) in points
                ]
                full = [(0, c.shape[0], 0, c.shape[1]) for c in crops]
                batch["sdf"] = batched(crops, full, False)
        if cfg.cutouts:
            batch["points"] = np.asarray(points, np.int32)
        return batch

    def full_domain_sample(
        self, idx: int, pad_multiple: int = 16
    ) -> Dict[str, np.ndarray]:
        """One WHOLE-DOMAIN sample — no cutout: every field at the full
        grid, edge-padded up to ``pad_multiple`` so the UNet pyramid
        divides it (the flagship has 4 downsamples -> 16).

        Same keys and scaling as ``__getitem__``'s cutout path, plus
        ``domain_shape`` = the unpadded (H, W) so callers crop generated
        fields back. This feeds the spatially-sharded full-domain
        generation path (``cli.generate --full_domain``; SURVEY §5.7) —
        a capability the reference lacks entirely (it only ever samples
        cutouts, data_DANRA_conditional.py:818-860).
        """
        cfg = self.cfg
        file_name = self.files[idx]
        sample: Dict[str, np.ndarray] = {}
        if cfg.conditional_seasons:
            assert cfg.n_classes is not None, "n_classes required for labels"
            sample["classifier"] = np.asarray(
                DateFromFile(file_name).classify(cfg.n_classes), np.int32
            )

        img = self._load_image(file_name)
        h, w = img.shape
        ph, pw = (-h) % pad_multiple, (-w) % pad_multiple

        def pad(a: np.ndarray) -> np.ndarray:
            return np.pad(a, ((0, ph), (0, pw)), mode="edge")

        def scaled(a: np.ndarray) -> np.ndarray:
            out = pad(np.asarray(a, np.float32))
            if self.scaler is not None:
                out = self.scaler(out)
            return out[..., None]

        sample["img"] = scaled(img)
        if cfg.conditional_images:
            cond = self._load_cond(self.files_cond[idx], img)
            if cond.shape != img.shape:
                cond = _resize2d(cond, (h, w))
            sample["img_cond"] = scaled(cond)
        def geo(a: np.ndarray) -> np.ndarray:
            if a.shape != (h, w):  # geography grid differs from the store's
                a = _resize2d(a, (h, w))
            return pad(a)[..., None].astype(np.float32)

        if self.lsm_full is not None:
            sample["lsm"] = geo(self.lsm_full)
        if self.topo_full is not None:
            sample["topo"] = geo(self.topo_full)
        if self._want_sdf():
            sample["sdf"] = geo(normalize_sdf(generate_sdf(self.lsm_full)))
        sample["domain_shape"] = np.asarray((h, w), np.int32)
        return sample

    def _transform_mask(self, arr: np.ndarray) -> np.ndarray:
        """Masks/SDF are resized but NOT value-scaled — a deliberate
        divergence: the reference pushes lsm/topo/sdf through the same
        transform chain as temperature, including the Scale step with
        TEMPERATURE min/max (data_DANRA_conditional.py:1033-1037,
        1168-1175), which maps a 0/1 land-sea mask to two arbitrary
        points of the temperature range. Here geography channels keep
        their native units (lsm in {0,1}, sdf already normalized)."""
        out = _resize2d(arr, self.cfg.data_size)
        return out[..., None]


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack dict samples into an NHWC batch (the DataLoader role)."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class BatchLoader:
    """Epoch iterator: shuffle, batch, drop_last — the reference's torch
    DataLoader role (ddpm_DANRA_conditional_wValid.py:337-341).

    ``num_workers > 1`` assembles batches on a thread pool ahead of the
    consumer (``prefetch_batches`` deep), with each batch built by
    :meth:`DanraDataset.load_batch` — store reads fan out over the pool
    and the crop/resize/scale runs in the native threaded kernel.

    Measured (synthetic 256^2 store, 128px batch-32 full conditioning):
    the serial path with the dataset's raw-field cache sustains ~103
    batches/s warm (~23 cold) vs the 13.2 steps/s TPU train rate — the
    input pipeline never starves the chip (the reference's serial loader
    was its input bound, SURVEY.md hot loop #5). Threads only pay off for
    cold high-latency stores; with the cache warm they add overhead, so
    num_workers=0/1 is the right default on local storage.
    """

    def __init__(
        self,
        dataset: DanraDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 0,
        prefetch_batches: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch_batches = max(1, prefetch_batches)
        self._epoch = 0
        # two disjoint pools so batch-assembly futures never block waiting
        # for io tasks queued behind themselves (nested-pool deadlock)
        self._pool = None  # io: per-sample store reads
        self._assembler = None  # one thread per in-flight batch
        if num_workers and num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=num_workers, thread_name_prefix="dmc-io"
            )
            self._assembler = ThreadPoolExecutor(
                max_workers=self.prefetch_batches + 1,
                thread_name_prefix="dmc-batch",
            )

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield [int(i) for i in idx]

    def _make_batch(self, idx):
        if self._pool is not None and hasattr(self.dataset, "load_batch"):
            return self.dataset.load_batch(idx, pool=self._pool)
        return collate([self.dataset[i] for i in idx])

    def __iter__(self):
        if self._pool is None:
            for idx in self._batch_indices():
                yield self._make_batch(idx)
            return
        # pipelined: keep prefetch_batches batch-assembly futures in flight
        from collections import deque

        pending: deque = deque()
        it = self._batch_indices()
        try:
            for idx in it:
                pending.append(self._assembler.submit(self._make_batch, idx))
                if len(pending) > self.prefetch_batches:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            for f in pending:
                f.cancel()


__all__ = ["DanraDataset", "DanraDatasetConfig", "BatchLoader", "collate"]
