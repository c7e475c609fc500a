"""Imagen training data: image folders with caption handling + collation.

Rebuild of the cascade's data module (CascadedDDPM/data.py:37-120):

* ``ImageFolderDataset`` — images from a directory; captions come from
  sidecar ``.txt`` files or the filename stem (the reference's HF-dataset
  URL-download path needs network access and is out of scope for the
  zero-egress image; local folders cover the same trainer contract);
* ``ImagenCollator`` — batches images and runs T5 encoding inside collate,
  exactly where the reference does it (data.py:63-90), so the trainer
  receives ready (images, text_embeds, text_mask) arrays.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

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


class ImagenCollator:
    """Batch images + T5-encode captions inside collate (data.py:63-90)."""

    def __init__(self, t5_name: Optional[str] = None, max_length: int = 64):
        from ..models.imagen.t5 import DEFAULT_T5_NAME

        self.t5_name = t5_name or DEFAULT_T5_NAME
        self.max_length = max_length

    def __call__(
        self, samples: Sequence[Tuple[np.ndarray, str]]
    ) -> Dict[str, np.ndarray]:
        from ..models.imagen.t5 import t5_encode_text

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
            yield self.collator([self.dataset[int(i)] for i in idx])


__all__ = ["ImageFolderDataset", "ImagenCollator", "ImagenLoader"]
