"""Device EDT / SDF vs the scipy + host-geo ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import distance_transform_edt

from diffusionmodelscustom_tpu.ops import edt as dedt


def _rand_mask(h, w, p, seed):
    rng = np.random.default_rng(seed)
    return rng.random((h, w)) < p


@pytest.mark.parametrize("h,w,p,seed", [
    (16, 16, 0.3, 0),
    (32, 24, 0.05, 1),
    (24, 32, 0.9, 2),
    (64, 64, 0.5, 3),
    (8, 40, 0.2, 4),
])
def test_edt_matches_scipy(h, w, p, seed):
    m = _rand_mask(h, w, p, seed)
    if not m.any():
        m[0, 0] = True
    ref = distance_transform_edt(~m)
    out = np.asarray(dedt.edt(jnp.asarray(m)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_edt_batched():
    ms = np.stack([_rand_mask(16, 16, 0.3, s) for s in range(4)])
    ms[:, 0, 0] = True
    ref = np.stack([distance_transform_edt(~m) for m in ms])
    out = np.asarray(dedt.edt(jnp.asarray(ms)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_edt_single_seed_corner():
    m = np.zeros((8, 8), bool)
    m[0, 0] = True
    ref = distance_transform_edt(~m)
    out = np.asarray(dedt.edt(jnp.asarray(m)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_edt_all_true_is_zero():
    out = np.asarray(dedt.edt(jnp.ones((8, 8), bool)))
    assert (out == 0).all()


def test_generate_normalize_sdf_match_host():
    from diffusionmodelscustom_tpu.data.geo import (
        generate_sdf as host_sdf,
        normalize_sdf as host_norm,
    )

    m = _rand_mask(32, 32, 0.4, 7)
    m[3, 3] = True
    want = host_norm(host_sdf(m.astype(np.float32)))
    got = np.asarray(
        dedt.normalize_sdf(dedt.generate_sdf(jnp.asarray(m, jnp.float32)))
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_normalize_sdf_constant_field_zeros():
    out = np.asarray(dedt.normalize_sdf(jnp.full((4, 4), 3.0)))
    assert (out == 0).all()
