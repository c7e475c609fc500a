"""Tests for continuous-time diffusion and EDM math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodelscustom_tpu.core import ContinuousDiffusion, EDMConfig, dynamic_threshold
from diffusionmodelscustom_tpu.sampling import edm_sample, p_sample_loop_continuous


class TestContinuous:
    def test_q_sample_alpha_sigma_norm(self):
        sch = ContinuousDiffusion(noise_schedule="cosine")
        x0 = jax.random.normal(jax.random.key(0), (4, 8, 8, 1))
        eps = jax.random.normal(jax.random.key(1), x0.shape)
        t = jnp.array([0.1, 0.4, 0.7, 0.95])
        x_t, log_snr, alpha, sigma = sch.q_sample(x0, t, eps)
        np.testing.assert_allclose(
            np.asarray(alpha**2 + sigma**2).ravel(), 1.0, atol=1e-5
        )
        # x_t interpolates x0 (early t) to noise (late t)
        assert x_t.shape == x0.shape

    def test_predict_start_inverts_q_sample(self):
        sch = ContinuousDiffusion()
        x0 = jax.random.normal(jax.random.key(2), (2, 4, 4, 1))
        eps = jax.random.normal(jax.random.key(3), x0.shape)
        t = jnp.array([0.3, 0.8])
        x_t, *_ = sch.q_sample(x0, t, eps)
        np.testing.assert_allclose(
            np.asarray(sch.predict_start_from_noise(x_t, t, eps)),
            np.asarray(x0),
            rtol=1e-3,
            atol=1e-4,
        )
        v = sch.calculate_v(x0, t, eps)
        np.testing.assert_allclose(
            np.asarray(sch.predict_start_from_v(x_t, t, v)),
            np.asarray(x0),
            rtol=1e-3,
            atol=1e-4,
        )

    def test_q_posterior_terminal_consistency(self):
        # posterior mean at t_next -> collapses toward x_start as c -> 1
        sch = ContinuousDiffusion(num_timesteps=100)
        x0 = jnp.full((1, 2, 2, 1), 0.5)
        x_t = jnp.zeros_like(x0)
        mean, var, logvar = sch.q_posterior(
            x0, x_t, jnp.array([0.9]), jnp.array([0.0])
        )
        # t_next=0 -> alpha_next ~ 1, c ~ 1 -> mean ~ x0
        np.testing.assert_allclose(np.asarray(mean), 0.5, atol=1e-2)
        assert float(var.min()) >= 0.0

    def test_q_sample_from_to_renoise(self):
        # re-noising to a higher noise level matches direct q_sample in law:
        # check variance increases
        sch = ContinuousDiffusion()
        x0 = jnp.zeros((8, 8, 8, 1))
        eps1 = jax.random.normal(jax.random.key(4), x0.shape)
        x_a, *_ = sch.q_sample(x0, jnp.full((8,), 0.2), eps1)
        eps2 = jax.random.normal(jax.random.key(5), x0.shape)
        x_b = sch.q_sample_from_to(
            x_a, jnp.full((8,), 0.2), jnp.full((8,), 0.7), eps2
        )
        assert float(jnp.std(x_b)) > float(jnp.std(x_a))

    def test_sampling_loop_with_perfect_model(self):
        sch = ContinuousDiffusion(num_timesteps=50)
        target = 0.4

        def model_fn(x, log_snr, t):
            # exact noise for constant target
            from diffusionmodelscustom_tpu.core.schedules import (
                log_snr_to_alpha_sigma,
                right_pad_dims_to,
            )

            a, s = log_snr_to_alpha_sigma(right_pad_dims_to(x, log_snr))
            return (x - a * target) / jnp.clip(s, 1e-8, None)

        out = p_sample_loop_continuous(
            model_fn, sch, jax.random.key(0), (2, 8, 8, 1)
        )
        np.testing.assert_allclose(np.asarray(out), target, atol=0.1)

    def test_dynamic_threshold(self):
        x = jnp.concatenate(
            [jnp.full((1, 10), 0.5), jnp.full((1, 10), 3.0)], axis=-1
        ).reshape(1, 4, 5, 1)
        out = dynamic_threshold(x, percentile=0.5)
        assert float(jnp.abs(out).max()) <= 1.0
        # small values shrink proportionally (divided by s)
        assert float(out.min()) < 0.5

    def test_bad_schedule_name(self):
        with pytest.raises(ValueError):
            ContinuousDiffusion(noise_schedule="nope").log_snr(jnp.array([0.5]))


class TestEDM:
    def test_preconditioning_identity_weights(self):
        cfg = EDMConfig()
        sigma = jnp.array([1.0, 0.3])
        # c_skip + preconditioning algebra
        np.testing.assert_allclose(
            np.asarray(cfg.c_skip(sigma)),
            np.asarray(cfg.sigma_data**2 / (sigma**2 + cfg.sigma_data**2)),
        )
        # c_in * sqrt(sigma^2 + sigma_data^2) == 1
        np.testing.assert_allclose(
            np.asarray(cfg.c_in(sigma) * jnp.sqrt(sigma**2 + cfg.sigma_data**2)),
            1.0,
            rtol=1e-6,
        )

    def test_noise_distribution_lognormal(self):
        cfg = EDMConfig()
        s = cfg.noise_distribution(jax.random.key(0), 20000)
        logs = jnp.log(s)
        assert abs(float(logs.mean()) - cfg.P_mean) < 0.05
        assert abs(float(logs.std()) - cfg.P_std) < 0.05

    def test_loss_weight(self):
        cfg = EDMConfig(sigma_data=0.5)
        w = cfg.loss_weight(jnp.array([0.5]))
        expected = (0.25 + 0.25) / (0.5 * 0.5) ** 2
        assert float(w[0]) == pytest.approx(expected, rel=1e-5)

    def test_edm_sample_with_perfect_denoiser(self):
        cfg = EDMConfig(num_sample_steps=16, S_churn=0.0)
        target = 0.25

        def denoise_fn(x, sigma):
            return jnp.full_like(x, target)  # perfect denoiser

        out = edm_sample(denoise_fn, cfg, jax.random.key(0), (2, 8, 8, 1))
        np.testing.assert_allclose(np.asarray(out), target, atol=1e-3)

    def test_gammas_gating(self):
        cfg = EDMConfig(num_sample_steps=10, S_churn=80.0, S_tmin=0.05, S_tmax=50.0)
        sig = jnp.array([100.0, 10.0, 0.01])
        g = np.asarray(cfg.gammas(sig))
        assert g[0] == 0.0 and g[2] == 0.0 and g[1] > 0.0
