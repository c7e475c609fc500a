"""Golden-value tests against PyTorch ops (CPU torch is available).

The rebuild promises *math semantics* parity with the reference's torch
building blocks; these tests pin the numerics of our jnp implementations
against the exact torch ops the reference uses."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from diffusionmodelscustom_tpu.core.schedules import (  # noqa: E402
    cosine_beta_schedule,
    linear_beta_schedule,
)
from diffusionmodelscustom_tpu.ops.norms import instance_norm  # noqa: E402
from diffusionmodelscustom_tpu.ops.embeddings import (  # noqa: E402
    pos_encoding_block,
    sinusoidal_embedding,
)


def test_instance_norm_matches_torch():
    # torch nn.InstanceNorm2d defaults: affine=False, eps=1e-5
    # (modules_DANRA_conditional.py:412-419)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 8, 8, 5)).astype(np.float32) * 4 + 2
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    xt = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
    theirs = torch.nn.InstanceNorm2d(5)(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_betas_match_torch_linspace():
    ours = np.asarray(linear_beta_schedule(800, 1e-4, 0.02))
    theirs = torch.linspace(1e-4, 0.02, 800).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-9)


def test_cosine_betas_match_torch_formula():
    # src/diffusion_modules.py:62-69 computed with torch ops
    T = 1000
    t = torch.linspace(0, T, T + 1)
    ft = torch.cos(((t / T + 0.008) / 1.008) * np.pi / 2) ** 2
    alphat = ft / ft[0]
    betat = torch.clip(1 - alphat[1:] / alphat[:-1], 0.0001, 0.9999)
    ours = np.asarray(cosine_beta_schedule(T))
    np.testing.assert_allclose(ours, betat.numpy(), rtol=3e-4, atol=1e-7)


def test_pos_encoding_matches_torch_loop():
    # Encoder.pos_encoding with n=1000 (modules_DANRA_conditional.py:203-211)
    dim = 32
    tt = torch.tensor([[3.0], [77.0], [799.0]])
    inv_freq = 1.0 / (1000 ** (torch.arange(0, dim, 2).float() / dim))
    pos_a = torch.sin(tt.repeat(1, dim // 2) * inv_freq)
    pos_b = torch.cos(tt.repeat(1, dim // 2) * inv_freq)
    theirs = torch.cat([pos_a, pos_b], dim=-1).numpy()
    ours = np.asarray(pos_encoding_block(jnp.array([3.0, 77.0, 799.0]), dim, n=1000.0))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_sinusoidal_embedding_matches_torch_loop():
    # SinusoidalEmbedding forward loop (modules_DANRA_conditional.py:54-61)
    dim, n = 16, 10000
    vals = [0.0, 5.0, 123.0]
    theirs = torch.zeros((3, dim))
    for idx, v in enumerate(vals):
        for i in range(dim // 2):
            emb = torch.tensor(v / (n ** (2 * i / dim)))
            theirs[idx, 2 * i] = torch.sin(emb)
            theirs[idx, 2 * i + 1] = torch.cos(emb)
    ours = np.asarray(sinusoidal_embedding(jnp.asarray(vals), dim))
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_q_sample_matches_torch_noise_image():
    # noiseImage math (diffusion_DANRA_conditional.py:85-103) with shared
    # inputs computed both ways
    from diffusionmodelscustom_tpu.core.ddpm import GaussianDiffusion

    T = 100
    diff = GaussianDiffusion.create(n_timesteps=T, scheduler="linear")
    betas_t = torch.linspace(1e-4, 0.02, T)
    alphas_t = 1 - betas_t
    alpha_hat_t = torch.cumprod(alphas_t, dim=0)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    t_idx = np.array([7, 42])

    ab = alpha_hat_t[torch.tensor(t_idx)].reshape(2, 1, 1, 1)
    theirs = (
        torch.sqrt(ab) * torch.tensor(x) + torch.sqrt(1 - ab) * torch.tensor(eps)
    ).numpy()
    ours = np.asarray(diff.q_sample(jnp.asarray(x), jnp.asarray(t_idx), jnp.asarray(eps)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_layernorm_attention_input_matches_torch():
    # the attention pre-norm (modules_DANRA_conditional.py:87,103)
    import jax
    from flax import linen as nn

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    ln = nn.LayerNorm()
    params = ln.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(ln.apply(params, jnp.asarray(x)))
    theirs = torch.nn.LayerNorm(8)(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
