"""Tests for the loss registry — checked against independently coded formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodelscustom_tpu.core import losses


def test_simple_loss_is_mse():
    p = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    t = jnp.array([[1.5, 2.0], [2.0, 6.0]])
    assert float(losses.simple_loss(p, t)) == pytest.approx(
        np.mean((np.asarray(p) - np.asarray(t)) ** 2)
    )


def test_sdf_weighted_mse_limits():
    p = jnp.ones((1, 4, 4, 1))
    t = jnp.zeros((1, 4, 4, 1))
    land = jnp.full((1, 4, 4, 1), 100.0)  # deep land: sigmoid -> 1
    sea = jnp.full((1, 4, 4, 1), -100.0)  # deep sea: sigmoid -> 0
    assert float(losses.sdf_weighted_mse(p, t, land)) == pytest.approx(1.0, rel=1e-5)
    assert float(losses.sdf_weighted_mse(p, t, sea)) == pytest.approx(0.5, rel=1e-5)
    # mid-transition sdf=0 -> weight 0.75
    mid = jnp.zeros((1, 4, 4, 1))
    assert float(losses.sdf_weighted_mse(p, t, mid)) == pytest.approx(0.75, rel=1e-5)


def test_hybrid_loss_formula():
    # loss = mse(pred[-1], tgt[0]) + alpha*sum_t mse(pred[t-1], tgt[t])
    T = 4
    rng = np.random.default_rng(0)
    preds = rng.normal(size=(T, 2, 3, 3, 1)).astype(np.float32)
    tgts = rng.normal(size=(T, 2, 3, 3, 1)).astype(np.float32)
    expected = np.mean((preds[-1] - tgts[0]) ** 2)
    for t in range(1, T):
        expected += 0.5 * np.mean((preds[t - 1] - tgts[t]) ** 2)
    got = float(losses.hybrid_loss(jnp.asarray(preds), jnp.asarray(tgts), alpha=0.5))
    assert got == pytest.approx(expected, rel=1e-4)


def test_min_snr_weight_objectives():
    ab = jnp.array([0.5])  # snr = 1
    assert float(losses.min_snr_weight(ab, gamma=5.0, objective="noise")[0]) == pytest.approx(1.0)
    assert float(losses.min_snr_weight(ab, gamma=5.0, objective="v")[0]) == pytest.approx(0.5)
    assert float(losses.min_snr_weight(ab, gamma=5.0, objective="x_start")[0]) == pytest.approx(1.0)
    # high snr gets clipped by gamma
    ab_hi = jnp.array([0.999])  # snr ~ 999
    w = float(losses.min_snr_weight(ab_hi, gamma=5.0, objective="noise")[0])
    assert w == pytest.approx(5.0 / (0.999 / 0.001), rel=1e-2)


def test_cfg_lerp():
    u = jnp.zeros((2, 2))
    c = jnp.ones((2, 2))
    np.testing.assert_allclose(
        np.asarray(losses.classifier_free_guidance(u, c, 0.0)), 0.0
    )
    np.testing.assert_allclose(
        np.asarray(losses.classifier_free_guidance(u, c, 1.0)), 1.0
    )
    np.testing.assert_allclose(
        np.asarray(losses.classifier_free_guidance(u, c, 3.0)), 3.0
    )


def test_registry_lookup():
    assert losses.get_loss("simple") is losses.simple_loss
    assert losses.get_loss("sdfweighted") is losses.sdf_weighted_mse
    with pytest.raises(ValueError):
        losses.get_loss("nope")
