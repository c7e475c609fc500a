"""Progressive distillation (train/distill.py, arXiv:2202.00512) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodelscustom_tpu.core import GaussianDiffusion
from diffusionmodelscustom_tpu.models import ConditionalUNet
from diffusionmodelscustom_tpu.train import (
    DistillConfig,
    ProgressiveDistiller,
    distillation_target,
    progressive_distill,
    student_ddim_grid,
)


def test_student_grid_shape_and_order():
    grid = student_ddim_grid(1000, 8)
    g = np.asarray(grid)
    assert g.shape == (9,)
    assert g[0] == 999 and g[-1] == -1
    assert (np.diff(g) < 0).all()


def test_target_inverts_ddim_step_exactly():
    """One student DDIM step with eps* must land exactly on x_u — the
    closed form is the inverse of GaussianDiffusion.ddim_step."""
    diffusion = GaussianDiffusion.create(n_timesteps=100)
    rng = jax.random.key(0)
    x_t = jax.random.normal(rng, (4, 8, 8, 1))
    x_u = jax.random.normal(jax.random.fold_in(rng, 1), (4, 8, 8, 1))
    t = jnp.array([90, 50, 10, 1], jnp.int32)
    u = jnp.array([70, 30, 0, -1], jnp.int32)
    eps_star = distillation_target(diffusion, x_t, x_u, t, u)
    landed = diffusion.ddim_step(x_t, t, u, eps_star)
    np.testing.assert_allclose(
        np.asarray(landed), np.asarray(x_u), atol=1e-4, rtol=1e-4
    )


def test_perfect_teacher_is_a_fixed_point():
    """For x0 = 0 data the exact denoiser is eps(x, t) = x / sqrt(1-abar_t);
    two exact DDIM steps then give a target equal to that same eps — the
    distillation loss of a perfect one-step student is zero."""
    diffusion = GaussianDiffusion.create(n_timesteps=200)
    rng = jax.random.key(2)
    x_t = jax.random.normal(rng, (3, 4, 4, 1))
    t = jnp.array([150, 80, 20], jnp.int32)
    s = jnp.array([100, 50, 9], jnp.int32)
    u = jnp.array([60, 20, -1], jnp.int32)

    def eps(x, tt):
        a = diffusion.alpha_bar[jnp.maximum(tt, 0)].reshape(-1, 1, 1, 1)
        return x / jnp.sqrt(1.0 - a)

    x_s = diffusion.ddim_step(x_t, t, s, eps(x_t, t))
    x_u = diffusion.ddim_step(x_s, s, u, eps(x_s, s))
    target = distillation_target(diffusion, x_t, x_u, t, u)
    np.testing.assert_allclose(
        np.asarray(target), np.asarray(eps(x_t, t)), atol=1e-4, rtol=1e-3
    )


def _tiny_setup():
    model = ConditionalUNet(
        out_channels=1, base_channels=8, time_dim=32, n_heads=2,
        num_classes=None, attention_levels=(2,), attention_levels_up=(2,),
    )
    diffusion = GaussianDiffusion.create(n_timesteps=64)
    x = jnp.zeros((2, 16, 16, 1))
    params = model.init(
        jax.random.key(0), x, jnp.zeros((2,), jnp.int32)
    )["params"]
    return model, diffusion, params


def test_distill_step_runs_and_learns():
    model, diffusion, teacher = _tiny_setup()
    d = ProgressiveDistiller(
        model, diffusion, teacher,
        DistillConfig(num_student_steps=4, learning_rate=1e-3, ema=True),
    )
    state = d.init_state()
    batch = {"img": jax.random.normal(jax.random.key(1), (2, 16, 16, 1))}
    losses = []
    for k in range(4):
        state, m = d.distill_step(state, batch, jax.random.fold_in(jax.random.key(2), k))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 4
    # student moved away from the teacher initialization
    diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(
            lambda a, b: a - b, state.params, teacher
        ),
        0.0,
    )
    assert diff > 0


def test_progressive_halving_loop():
    model, diffusion, teacher = _tiny_setup()

    def batches():
        k = 0
        while True:
            yield {"img": jax.random.normal(jax.random.key(k), (2, 16, 16, 1))}
            k += 1

    params, n = progressive_distill(
        model, diffusion, teacher, batches(),
        start_steps=4, end_steps=2, steps_per_round=2,
        config=DistillConfig(learning_rate=1e-3, ema=False),
    )
    assert n == 2
    # the result is a valid parameter pytree for the model
    out = model.apply(
        {"params": params},
        jnp.zeros((1, 16, 16, 1)),
        jnp.zeros((1,), jnp.int32),
    )
    assert out.shape == (1, 16, 16, 1)
    assert bool(jnp.isfinite(out).all())


def test_distill_scan_matches_sequential_steps():
    # K scanned updates == K sequential distill_step calls on the same
    # gathered batches and per-step RNG keys (the scanned path exists to
    # amortize dispatch/H2D on remote backends; it must be a pure
    # restructuring)
    model, diffusion, teacher = _tiny_setup()
    data = {"img": jax.random.normal(jax.random.key(5), (6, 16, 16, 1))}
    idx = jnp.asarray([[0, 2], [1, 3], [4, 5]], jnp.int32)  # K=3, B=2
    rngs = jax.random.split(jax.random.key(9), 3)
    cfg = DistillConfig(num_student_steps=4, learning_rate=1e-3, ema=True)

    d1 = ProgressiveDistiller(model, diffusion, teacher, cfg)
    s_seq = d1.init_state()
    for k in range(3):
        batch = {kk: v[idx[k]] for kk, v in data.items()}
        s_seq, m_seq = d1.distill_step(s_seq, batch, rngs[k])

    d2 = ProgressiveDistiller(model, diffusion, teacher, cfg)
    s_scan = d2.init_state()
    s_scan, m_scan = d2.distill_scan(s_scan, data, idx, rngs)

    assert int(s_scan.step) == 3
    np.testing.assert_allclose(
        float(m_scan["loss"]), float(m_seq["loss"]), rtol=1e-5
    )
    # absolute tolerance only: the scanned body and the standalone jit are
    # different XLA programs (different fusion rounding); fresh Adam
    # second moments amplify those last-ulp grad differences into ~1e-4
    # param wiggle after 3 updates. The matched final-step loss above is
    # the semantic-equivalence check.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4
        ),
        s_scan.params, s_seq.params,
    )
