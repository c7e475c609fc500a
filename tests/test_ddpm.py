"""Tests for the discrete-time DDPM process math."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodelscustom_tpu.core.ddpm import GaussianDiffusion


def make_diff(T=100):
    return GaussianDiffusion.create(n_timesteps=T, scheduler="linear")


def test_is_pytree_and_jittable():
    diff = make_diff()
    leaves = jax.tree_util.tree_leaves(diff)
    assert len(leaves) == 3  # betas, alphas, alpha_bar

    @jax.jit
    def f(d: GaussianDiffusion, x, t, eps):
        return d.q_sample(x, t, eps)

    x = jnp.ones((2, 8, 8, 1))
    t = jnp.array([5, 50])
    out = f(diff, x, t, jnp.zeros_like(x))
    assert out.shape == x.shape


def test_timestep_sampling_range():
    diff = make_diff(T=10)
    t = diff.sample_timesteps(jax.random.key(0), 10_000)
    assert int(t.min()) >= 1  # reference never samples t=0
    assert int(t.max()) <= 9


def test_q_sample_formula():
    diff = make_diff()
    rng = jax.random.key(1)
    x0 = jax.random.normal(rng, (4, 8, 8, 1))
    eps = jax.random.normal(jax.random.key(2), x0.shape)
    t = jnp.array([1, 10, 50, 99])
    xt = diff.q_sample(x0, t, eps)
    ab = np.asarray(diff.alpha_bar)[np.asarray(t)][:, None, None, None]
    expected = np.sqrt(ab) * np.asarray(x0) + np.sqrt(1 - ab) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(xt), expected, rtol=1e-5, atol=1e-6)


def test_p_step_matches_reference_update():
    # x <- 1/sqrt(a) (x - (1-a)/sqrt(1-abar) eps) + sqrt(b) z
    # (diffusion_DANRA_conditional.py:155-157)
    diff = make_diff()
    x = jax.random.normal(jax.random.key(3), (2, 4, 4, 1))
    eps_hat = jax.random.normal(jax.random.key(4), x.shape)
    z = jax.random.normal(jax.random.key(5), x.shape)
    t = jnp.array([7, 42])
    got = np.asarray(diff.p_step(x, t, eps_hat, z))

    a = np.asarray(diff.alphas)[np.asarray(t)][:, None, None, None]
    b = np.asarray(diff.betas)[np.asarray(t)][:, None, None, None]
    ab = np.asarray(diff.alpha_bar)[np.asarray(t)][:, None, None, None]
    expected = (1 / np.sqrt(a)) * (
        np.asarray(x) - (1 - a) / np.sqrt(1 - ab) * np.asarray(eps_hat)
    ) + np.sqrt(b) * np.asarray(z)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_pred_x0_inverts_q_sample():
    diff = make_diff()
    x0 = jax.random.normal(jax.random.key(6), (3, 8, 8, 2))
    eps = jax.random.normal(jax.random.key(7), x0.shape)
    t = jnp.array([3, 30, 90])
    xt = diff.q_sample(x0, t, eps)
    x0_hat = diff.pred_x0_from_noise(xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_ddim_step_deterministic_recovers_x0_with_perfect_eps():
    # With the true eps and a DDIM step to t_prev = 0 (alpha_bar -> 1), the
    # update returns exactly x0_hat.
    diff = make_diff()
    x0 = jax.random.normal(jax.random.key(8), (2, 4, 4, 1))
    eps = jax.random.normal(jax.random.key(9), x0.shape)
    t = jnp.array([80, 80])
    xt = diff.q_sample(x0, t, eps)
    out = diff.ddim_step(xt, t, jnp.array([-1, -1]), eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_data_scaled_noise():
    diff = GaussianDiffusion.create(n_timesteps=10, data_scaled=True)
    n = diff.noise(jax.random.key(0), jnp.zeros((2, 4, 4, 1)))
    assert float(jnp.abs(n).max()) < 0.05  # 0.005-scaled noise
