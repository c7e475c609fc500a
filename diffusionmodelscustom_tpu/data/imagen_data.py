"""Imagen training data: image folders with caption handling + collation.

Rebuild of the cascade's data module (CascadedDDPM/data.py:37-120):

* ``ImageFolderDataset`` — images from a directory; captions come from
  sidecar ``.txt`` files or the filename stem;
* ``ImagenCollator`` — batches images and runs T5 encoding inside collate,
  exactly where the reference does it (data.py:63-90), so the trainer
  receives ready (images, text_embeds, text_mask) arrays. With
  ``url_label``/``text_label`` set it accepts mapping records and fetches
  each image by URL inside collate (data.py:37-90's LAION path), skipping
  failed downloads and returning ``None`` when every item failed — the
  fetcher is injectable so the path is testable offline with ``file://``
  URLs;
* ``hf_dataset_records`` — import-guarded HF-datasets adapter
  (cli.py:140-151's ``load_dataset`` role); the returned split indexes
  like a dataset of records and feeds ``ImagenLoader`` + a record-mode
  collator directly.
"""

from __future__ import annotations

import io
import urllib.request
import warnings
from pathlib import Path
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

IMAGE_SUFFIXES = (".npy", ".png", ".jpg", ".jpeg")


def _load_image(path: Path, image_size: int, channels: int) -> np.ndarray:
    if path.suffix == ".npy":
        arr = np.asarray(np.load(path), np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
    else:
        from PIL import Image

        img = Image.open(path).convert("RGB" if channels == 3 else "L")
        img = img.resize((image_size, image_size), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
    if arr.shape[:2] != (image_size, image_size):
        from PIL import Image

        chans = [
            np.asarray(
                Image.fromarray(arr[..., c], mode="F").resize(
                    (image_size, image_size), Image.BILINEAR
                )
            )
            for c in range(arr.shape[-1])
        ]
        arr = np.stack(chans, axis=-1)
    if arr.shape[-1] != channels:
        arr = np.repeat(arr[..., :1], channels, axis=-1)
    return np.clip(arr, 0.0, 1.0)


class ImageFolderDataset:
    """(image, caption) pairs from a directory (data.py:92-120 role)."""

    def __init__(
        self,
        folder,
        image_size: int = 64,
        channels: int = 3,
    ):
        self.folder = Path(folder)
        self.image_size = image_size
        self.channels = channels
        self.paths: List[Path] = sorted(
            p for p in self.folder.rglob("*") if p.suffix.lower() in IMAGE_SUFFIXES
        )
        if not self.paths:
            raise FileNotFoundError(f"no images under {folder}")

    def __len__(self) -> int:
        return len(self.paths)

    def caption(self, idx: int) -> str:
        p = self.paths[idx]
        sidecar = p.with_suffix(".txt")
        if sidecar.exists():
            return sidecar.read_text().strip()
        return p.stem.replace("_", " ").replace("-", " ")

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        return (
            _load_image(self.paths[idx], self.image_size, self.channels),
            self.caption(idx),
        )


def default_fetcher(url: str, timeout: float = 1.0) -> bytes:
    """Fetch raw bytes for an image URL (data.py:78-90 role).

    Supports anything ``urllib`` does — http(s):// when the environment
    has egress, and file:// always (what the offline tests use). The
    reference's 1 s default timeout is kept: a LAION-style loader must
    not stall an epoch on one dead link.
    """
    with urllib.request.urlopen(url, timeout=timeout) as req:
        return req.read()


def _decode_image_bytes(
    data: bytes, image_size: int, channels: int
) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB" if channels == 3 else "L")
    img = img.resize((image_size, image_size), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return np.clip(arr, 0.0, 1.0)


class ImagenCollator:
    """Batch images + T5-encode captions inside collate (data.py:63-90).

    Two record shapes are accepted:

    * ``(image_array, caption)`` tuples — the ImageFolderDataset contract;
    * mapping records (HF-dataset rows) when ``url_label`` and/or
      ``image_label`` plus ``text_label`` are set — the reference
      Collator's contract (data.py:37-76). With ``url_label`` the image
      is fetched by URL inside collate; failures are SKIPPED (reference
      behavior) and an all-failed batch returns ``None``.
    """

    def __init__(
        self,
        t5_name: Optional[str] = None,
        max_length: int = 64,
        *,
        url_label: Optional[str] = None,
        text_label: Optional[str] = None,
        image_label: Optional[str] = None,
        image_size: int = 64,
        channels: int = 3,
        fetcher: Optional[Callable[[str], bytes]] = None,
    ):
        from ..models.imagen.t5 import DEFAULT_T5_NAME

        self.t5_name = t5_name or DEFAULT_T5_NAME
        self.max_length = max_length
        self.url_label = url_label
        self.text_label = text_label
        self.image_label = image_label
        self.image_size = image_size
        self.channels = channels
        self.fetcher = fetcher or default_fetcher
        self.download = url_label is not None

    def _record_image(self, item: Mapping[str, Any]) -> Optional[np.ndarray]:
        try:
            if self.download:
                data = self.fetcher(item[self.url_label])
                return _decode_image_bytes(data, self.image_size, self.channels)
            img = item[self.image_label]
            if hasattr(img, "convert"):  # PIL image in an HF record
                img = img.convert("RGB" if self.channels == 3 else "L")
                img = img.resize(
                    (self.image_size, self.image_size)
                )
                arr = np.asarray(img, np.float32) / 255.0
                return arr[..., None] if arr.ndim == 2 else arr
            return np.asarray(img, np.float32)
        except Exception as e:  # skip failed fetch/decode (data.py:58-60)
            warnings.warn(f"skipping record: {e!r}", stacklevel=2)
            return None

    def __call__(
        self, samples: Sequence[Any]
    ) -> Optional[Dict[str, np.ndarray]]:
        from ..models.imagen.t5 import t5_encode_text

        if samples and isinstance(samples[0], Mapping):
            assert self.text_label is not None, (
                "mapping records need text_label (and url_label or "
                "image_label)"
            )
            pairs = [
                (img, item[self.text_label])
                for item in samples
                if (img := self._record_image(item)) is not None
            ]
            if not pairs:
                return None  # reference returns None for an empty batch
            images = np.stack([p[0] for p in pairs])
            captions = [p[1] for p in pairs]
        else:
            images = np.stack([s[0] for s in samples])
            captions = [s[1] for s in samples]
        embeds, mask = t5_encode_text(
            captions, name=self.t5_name, max_length=self.max_length
        )
        return {"images": images, "text_embeds": embeds, "text_mask": mask}


class ImagenLoader:
    """Shuffled epoch iterator over (dataset, collator)."""

    def __init__(
        self,
        dataset: ImageFolderDataset,
        batch_size: int,
        *,
        collator: Optional[ImagenCollator] = None,
        shuffle: bool = True,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collator = collator or ImagenCollator()
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
            idx = order[start : start + self.batch_size]
            batch = self.collator([self.dataset[int(i)] for i in idx])
            if batch is not None:  # record-mode: every fetch in it failed
                yield batch


def hf_dataset_records(name: str, split: str = "train", **load_kwargs):
    """HF-datasets adapter (cli.py:140-151's ``load_dataset(name)`` role).

    Returns the split as an indexable dataset of mapping records — feed
    it to :class:`ImagenLoader` with a record-mode :class:`ImagenCollator`
    (``url_label``/``text_label`` from the config, exactly the reference's
    Collator wiring). Import-guarded: the ``datasets`` package (and, for
    remote datasets, network egress) is only required when this is called.
    """
    try:
        from datasets import load_dataset
    except ImportError as e:
        raise ImportError(
            "hf_dataset_records needs the 'datasets' package; install it "
            "or use ImageFolderDataset / a record list instead"
        ) from e
    ds = load_dataset(name, **load_kwargs)
    return ds[split] if split else ds


__all__ = [
    "ImageFolderDataset",
    "ImagenCollator",
    "ImagenLoader",
    "default_fetcher",
    "hf_dataset_records",
]
