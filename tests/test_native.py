"""Native C++ kernel tests (skipped when the library can't build)."""

import numpy as np
import pytest

from diffusionmodelscustom_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.have_native(), reason="native library not built"
)


def test_edt_matches_scipy():
    from scipy.ndimage import distance_transform_edt

    rng = np.random.default_rng(0)
    mask = rng.random((100, 150)) > 0.8
    np.testing.assert_allclose(
        native.edt(mask), distance_transform_edt(~mask), atol=1e-3
    )


def test_edt_all_sea_finite():
    out = native.edt(np.zeros((16, 16)))
    assert np.isfinite(out).all()


def test_crop_resize_matches_pil():
    from PIL import Image

    rng = np.random.default_rng(1)
    src = rng.standard_normal((64, 64)).astype(np.float32)
    ours = native.crop_resize_scale(src, (8, 40, 8, 40), (16, 16), -1, 1, -2, 2)
    crop = src[8:40, 8:40]
    pil = np.asarray(
        Image.fromarray(crop, mode="F").resize((16, 16), Image.BILINEAR)
    )
    pil = (pil + 2.0) * (2.0 / 4.0) - 1.0
    np.testing.assert_allclose(ours, pil, atol=1e-5)


def test_batch_matches_serial():
    rng = np.random.default_rng(2)
    srcs = [rng.standard_normal((50, 60)).astype(np.float32) for _ in range(5)]
    wins = [(0, 32, 0, 32), (10, 42, 10, 42)] + [(0, 50, 0, 60)] * 3
    batch = native.batch_crop_resize_scale(srcs, wins, (16, 16), 0, 1, -1, 1)
    serial = np.stack(
        [
            native.crop_resize_scale(s, w, (16, 16), 0, 1, -1, 1)
            for s, w in zip(srcs, wins)
        ]
    )
    np.testing.assert_array_equal(batch, serial)
