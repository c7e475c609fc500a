"""Unit tests for noise schedules — numerically checked against the formulas
cited from the reference (independent numpy reimplementations, not imports)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from diffusionmodelscustom_tpu.core import schedules


def test_linear_matches_linspace():
    T = 800
    betas = np.asarray(schedules.linear_beta_schedule(T, 1e-4, 0.02))
    expected = np.linspace(1e-4, 0.02, T, dtype=np.float32)
    np.testing.assert_allclose(betas, expected, rtol=1e-6)


def test_cosine_ramp_matches_reference_loop():
    # Reference builds betas by looping i = T-1..0 and appending
    # beta_min + 0.5*(beta_max-beta_min)*(1+cos(i/(T-1)*pi))
    # (diffusion_DANRA_conditional.py:65-77).
    T, bmin, bmax = 100, 1e-4, 0.02
    expected = []
    for i in reversed(range(T)):
        expected.append(bmin + 0.5 * (bmax - bmin) * (1 + math.cos(i / (T - 1) * math.pi)))
    got = np.asarray(schedules.cosine_ramp_beta_schedule(T, bmin, bmax))
    np.testing.assert_allclose(got, np.asarray(expected, np.float32), rtol=1e-5)
    # ramps monotonically from bmin to bmax
    assert got[0] == pytest.approx(bmin, rel=1e-4)
    assert got[-1] == pytest.approx(bmax, rel=1e-4)
    assert np.all(np.diff(got) >= 0)


def test_true_cosine_matches_nichol_dhariwal():
    # src/diffusion_modules.py:62-69 formula, independently in numpy.
    T = 1000
    t = np.linspace(0, T, T + 1)
    ft = np.cos(((t / T + 0.008) / 1.008) * np.pi / 2) ** 2
    alphat = ft / ft[0]
    betat = np.clip(1 - alphat[1:] / alphat[:-1], 1e-4, 0.9999)
    got = np.asarray(schedules.cosine_beta_schedule(T))
    np.testing.assert_allclose(got, betat.astype(np.float32), rtol=2e-4, atol=1e-6)


def test_dispatch_names():
    assert schedules.make_beta_schedule("linear", 10).shape == (10,)
    assert schedules.make_beta_schedule("cosine", 10).shape == (10,)
    assert schedules.make_beta_schedule("cosine_ramp", 10).shape == (10,)
    with pytest.raises(ValueError):
        schedules.make_beta_schedule("quadratic", 10)


def test_log_snr_alpha_sigma_unit_norm():
    t = jnp.linspace(1e-3, 0.999, 64)
    for fn in (schedules.beta_linear_log_snr, schedules.alpha_cosine_log_snr):
        alpha, sigma = schedules.log_snr_to_alpha_sigma(fn(t))
        np.testing.assert_allclose(
            np.asarray(alpha**2 + sigma**2), 1.0, rtol=1e-5, atol=1e-5
        )


def test_karras_schedule_monotone_with_trailing_zero():
    s = np.asarray(schedules.karras_sigma_schedule(32, 0.002, 80.0, 7.0))
    assert s.shape == (33,)
    assert s[0] == pytest.approx(80.0, rel=1e-4)
    assert s[-2] == pytest.approx(0.002, rel=1e-3)
    assert s[-1] == 0.0
    assert np.all(np.diff(s) < 0)


def test_right_pad_dims():
    x = jnp.zeros((4, 8, 8, 3))
    t = jnp.ones((4,))
    assert schedules.right_pad_dims_to(x, t).shape == (4, 1, 1, 1)
