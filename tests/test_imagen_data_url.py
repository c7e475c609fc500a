"""URL-fetching collate + HF-datasets streaming adapter (round-2 VERDICT
item 6; reference: CascadedDDPM/data.py:37-90 Collator download path and
cli.py:140-151 load_dataset wiring) — exercised offline with file:// URLs
and a local HF json dataset."""

import json
import pathlib

import numpy as np
import pytest

from diffusionmodelscustom_tpu.data import (
    ImagenCollator,
    ImagenLoader,
)
from diffusionmodelscustom_tpu.data.imagen_data import (
    default_fetcher,
    hf_dataset_records,
)

TINY_T5 = str(pathlib.Path(__file__).parent / "assets" / "tiny-t5")


def _write_pngs(tmp_path, n=4, size=20):
    from PIL import Image

    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = (rng.uniform(0, 255, size=(size, size, 3))).astype(np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def _records(paths):
    return [
        {"URL": p.as_uri(), "TEXT": f"caption number {i}"}
        for i, p in enumerate(paths)
    ]


class TestURLCollate:
    def test_file_url_batch(self, tmp_path):
        paths = _write_pngs(tmp_path)
        coll = ImagenCollator(
            t5_name=TINY_T5, max_length=16, url_label="URL",
            text_label="TEXT", image_size=16, channels=3,
        )
        batch = coll(_records(paths))
        assert batch["images"].shape == (4, 16, 16, 3)
        assert batch["images"].min() >= 0.0 and batch["images"].max() <= 1.0
        assert batch["text_embeds"].shape[0] == 4
        assert batch["text_mask"].any(axis=1).all()

    def test_failed_fetch_skipped(self, tmp_path):
        paths = _write_pngs(tmp_path, n=3)
        records = _records(paths)
        records[1]["URL"] = (tmp_path / "missing.png").as_uri()
        coll = ImagenCollator(
            t5_name=TINY_T5, max_length=16, url_label="URL",
            text_label="TEXT", image_size=16,
        )
        with pytest.warns(UserWarning, match="skipping record"):
            batch = coll(records)
        # reference behavior: the dead link is dropped, not fatal
        assert batch["images"].shape[0] == 2

    def test_all_failed_returns_none(self, tmp_path):
        coll = ImagenCollator(
            t5_name=TINY_T5, max_length=16, url_label="URL",
            text_label="TEXT", image_size=16,
        )
        records = [{"URL": (tmp_path / "nope.png").as_uri(), "TEXT": "x"}]
        with pytest.warns(UserWarning):
            assert coll(records) is None

    def test_injectable_fetcher(self, tmp_path):
        """The fetcher is dependency-injected: serve bytes from memory."""
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.zeros((8, 8, 3), np.uint8)
        ).save(buf, format="PNG")
        calls = []

        def fetcher(url):
            calls.append(url)
            return buf.getvalue()

        coll = ImagenCollator(
            t5_name=TINY_T5, max_length=8, url_label="URL",
            text_label="TEXT", image_size=16, fetcher=fetcher,
        )
        batch = coll([{"URL": "laion://anything", "TEXT": "t"}])
        assert calls == ["laion://anything"]
        assert batch["images"].shape == (1, 16, 16, 3)

    def test_default_fetcher_file_url(self, tmp_path):
        p = tmp_path / "blob.bin"
        p.write_bytes(b"abc123")
        assert default_fetcher(p.as_uri()) == b"abc123"

    def test_tuple_contract_unchanged(self):
        coll = ImagenCollator(t5_name=TINY_T5, max_length=8)
        batch = coll([(np.zeros((16, 16, 3), np.float32), "hello")])
        assert batch["images"].shape == (1, 16, 16, 3)


class TestHFDatasetAdapter:
    def test_local_json_dataset_through_loader(self, tmp_path):
        """cli.py:140-151 wiring, end to end offline: load_dataset('json')
        -> record-mode collator fetching file:// URLs -> ImagenLoader."""
        paths = _write_pngs(tmp_path, n=4)
        data_file = tmp_path / "records.jsonl"
        data_file.write_text(
            "\n".join(json.dumps(r) for r in _records(paths))
        )
        ds = hf_dataset_records("json", data_files=str(data_file))
        assert len(ds) == 4 and ds[0]["TEXT"].startswith("caption")
        coll = ImagenCollator(
            t5_name=TINY_T5, max_length=16, url_label="URL",
            text_label="TEXT", image_size=16,
        )
        loader = ImagenLoader(ds, batch_size=2, collator=coll, seed=1)
        batches = list(loader)
        assert len(batches) == 2
        for b in batches:
            assert b["images"].shape == (2, 16, 16, 3)
            assert b["text_embeds"].shape[0] == 2
