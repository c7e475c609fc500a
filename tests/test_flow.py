"""Flow-matching (rectified flow) process + ODE sampler tests.

Beyond-reference capability (the reference is strictly DDPM,
diffusion_DANRA_conditional.py:13-159): core/flow.py trains through the
unified Trainer unchanged; sampling/flow.py integrates the learned
velocity field in a fused scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodelscustom_tpu.core import GaussianDiffusion, make_process
from diffusionmodelscustom_tpu.core.flow import RectifiedFlow
from diffusionmodelscustom_tpu.sampling import flow_sample
from diffusionmodelscustom_tpu.train import Trainer, TrainerConfig


def test_interpolation_endpoints():
    flow = RectifiedFlow.create(n_timesteps=100)
    x0 = jax.random.normal(jax.random.key(0), (4, 8, 8, 1))
    eps = jax.random.normal(jax.random.key(1), (4, 8, 8, 1))
    at_zero = flow.interpolate(x0, eps, jnp.zeros((4,)))
    at_one = flow.interpolate(x0, eps, jnp.full((4,), 100.0))
    np.testing.assert_allclose(at_zero, x0, atol=1e-6)
    np.testing.assert_allclose(at_one, eps, atol=1e-5)


def test_velocity_target_and_x0_inversion():
    flow = RectifiedFlow.create(n_timesteps=50)
    x0 = jax.random.normal(jax.random.key(0), (3, 4, 4, 1))
    t = jnp.array([5.0, 25.0, 45.0])
    x_t, v = flow.noise_image(jax.random.key(1), x0, t)
    # v = eps - x0 and x_t = x0 + tau v  =>  pred_x0_from_v inverts exactly
    np.testing.assert_allclose(
        flow.pred_x0_from_v(x_t, t, v), x0, atol=1e-5
    )


def test_time_sampling_ranges():
    flow_u = RectifiedFlow.create(n_timesteps=1000)
    t = flow_u.sample_timesteps(jax.random.key(0), 512)
    assert t.shape == (512,)
    assert float(t.min()) >= 0.0 and float(t.max()) < 1000.0
    flow_ln = RectifiedFlow.create(n_timesteps=1000, time_sampling="logit_normal")
    t2 = flow_ln.sample_timesteps(jax.random.key(0), 512)
    assert float(t2.min()) > 0.0 and float(t2.max()) < 1000.0
    # logit-normal concentrates mass at mid-path vs uniform
    mid = jnp.mean((t2 > 250) & (t2 < 750))
    assert float(mid) > 0.5


def test_euler_recovers_target_exactly_with_oracle_velocity():
    """With the true single-target velocity field v(x, tau) = (x - x0)/tau,
    every consistent ODE step lands exactly on the straight path, and the
    final step (tau -> 0) lands exactly on x0."""
    flow = RectifiedFlow.create(n_timesteps=100)
    x0 = jax.random.normal(jax.random.key(0), (2, 6, 6, 1))

    def oracle(x, t):
        tau = (t / flow.n_timesteps).reshape(-1, 1, 1, 1)
        return (x - x0) / jnp.maximum(tau, 1e-8)

    for steps, method in [(1, "euler"), (4, "euler"), (4, "heun")]:
        out = flow_sample(
            oracle, flow, jax.random.key(1), x0.shape,
            num_steps=steps, method=method,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-4, err_msg=f"{method}@{steps}")


def test_clip_denoised_bounds_implied_x0():
    flow = RectifiedFlow.create(n_timesteps=10)
    x = jnp.full((1, 4, 4, 1), 5.0)
    t = jnp.array([5.0])  # tau = 0.5
    v = jnp.zeros_like(x)  # implied x0 = 5.0, far out of [-1, 1]
    v_c = flow.clip_v(x, t, v)
    x0_c = flow.pred_x0_from_v(x, t, v_c)
    assert float(jnp.max(jnp.abs(x0_c))) <= 1.0 + 1e-5


def test_trainer_trains_velocity_model():
    """RectifiedFlow satisfies the Trainer's process contract unchanged."""
    from tests.test_trainer import make_batch, tiny_model

    model = tiny_model()
    flow = RectifiedFlow.create(n_timesteps=50)
    trainer = Trainer(model, flow, TrainerConfig(learning_rate=1e-3, ema=True))
    rng = jax.random.key(0)
    batch = make_batch(jax.random.key(1))
    state = trainer.init_state(rng, batch)
    losses = []
    for i in range(30):
        state, metrics = trainer.train_step(
            state, batch, jax.random.fold_in(rng, i)
        )
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    # and the trained model samples through the fused scan
    params = state.ema_params if state.ema_params is not None else state.params

    def velocity(x, t):
        return model.apply({"params": params}, x, t)

    out = flow_sample(velocity, flow, jax.random.key(2), (2, 16, 16, 1),
                      num_steps=8, clip_denoised=True)
    assert out.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_path_shapes():
    flow = RectifiedFlow.create(n_timesteps=20)

    def cond(x, t):
        return jnp.ones_like(x)

    def uncond(x, t):
        return jnp.zeros_like(x)

    out = flow_sample(cond, flow, jax.random.key(0), (1, 4, 4, 1),
                      num_steps=4, uncond_fn=uncond, cfg_scale=2.0)
    assert out.shape == (1, 4, 4, 1)


def test_generate_cli_flow_end_to_end(tmp_path):
    """diffusion.process=flow flows through config -> make_process ->
    flow_sample in the generation CLI (same surface as the DDPM e2e)."""
    from diffusionmodelscustom_tpu.cli.generate import main

    rc = main([
        "--platform", "cpu", "--synthetic",
        "--n_samples", "4", "--sample_batch", "4", "--hr_size", "16",
        "--sampler", "flow", "--ddim_steps", "4",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "diffusion.process=flow",
        "--set", "diffusion.n_timesteps=20",
        "--set", "unet.base_channels=8",
    ])
    assert rc == 0
    gen = np.load(
        tmp_path / "runs" / "generated_samples" / "gen_samples.npz"
    )["data"]
    assert gen.shape[0] == 4 and np.isfinite(gen).all()


def test_process_sampler_mismatch_refused(tmp_path):
    """A flow process with a DDPM sampler (or vice versa) is refused
    before any sampling happens (cli/inference.py guard)."""
    from diffusionmodelscustom_tpu.cli.generate import main

    common = [
        "--platform", "cpu", "--synthetic",
        "--n_samples", "2", "--sample_batch", "2", "--hr_size", "16",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "diffusion.n_timesteps=20",
        "--set", "unet.base_channels=8",
    ]
    with pytest.raises(SystemExit):
        main(common + ["--sampler", "ddim", "--set", "diffusion.process=flow"])
    with pytest.raises(SystemExit):
        main(common + ["--sampler", "flow"])


def test_make_process_factory():
    assert isinstance(make_process("ddpm", n_timesteps=10), GaussianDiffusion)
    assert isinstance(make_process("flow", n_timesteps=10), RectifiedFlow)
    with pytest.raises(ValueError):
        make_process("vdm")
    with pytest.raises(ValueError):
        RectifiedFlow.create(time_sampling="gaussian")
    with pytest.raises(ValueError):
        flow_sample(lambda x, t: x, RectifiedFlow.create(),
                    jax.random.key(0), (1, 2, 2, 1), method="rk4")
