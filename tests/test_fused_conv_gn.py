"""Fused conv+GN(1)+GELU Pallas kernel vs the flax composition it replaces.

The kernel (ops/fused_conv_gn.py) targets the flagship DoubleConv halves
(models/unet.py:93-103, the reference's src/unet_ms.py:30-49): bias-free
3x3 conv -> GroupNorm(num_groups=1) -> tanh GELU, plus the residual tail
``gelu(x + gn2(conv2(h)))``. Interpret mode runs the Pallas program on
CPU; numerics must match the oracle composition to bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from diffusionmodelscustom_tpu.ops.fused_conv_gn import fused_conv_gn_gelu


def _flax_half(x, w, gamma, beta, *, residual=None, gelu=True):
    """The exact DoubleConv half: nn.Conv(bias-free) -> GroupNorm(1) ->
    [+res] -> [nn.gelu]."""

    class Half(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.Conv(w.shape[-1], (3, 3), padding=1, use_bias=False,
                        name="conv")(h)
            h = nn.GroupNorm(num_groups=1, epsilon=1e-6, name="gn")(h)
            if residual is not None:
                h = residual + h
            if gelu:
                h = nn.gelu(h)
            return h

    params = {"conv": {"kernel": w},
              "gn": {"scale": gamma, "bias": beta}}
    return Half().apply({"params": params}, x)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("gelu", [True, False])
def test_matches_flax_composition(gelu):
    k = jax.random.split(jax.random.key(0), 4)
    x = _rand(k[0], (2, 8, 12, 8))
    w = _rand(k[1], (3, 3, 8, 8)) * 0.3
    gamma = 1.0 + 0.1 * _rand(k[2], (8,))
    beta = 0.1 * _rand(k[3], (8,))
    got = fused_conv_gn_gelu(x, w, gamma, beta, gelu=gelu, interpret=True)
    want = _flax_half(x, w, gamma, beta, gelu=gelu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_residual_tail():
    """gelu(res + GN(conv(x))) — the DoubleConv residual mode."""
    k = jax.random.split(jax.random.key(1), 5)
    x = _rand(k[0], (2, 6, 8, 8))
    res = _rand(k[4], (2, 6, 8, 8))
    w = _rand(k[1], (3, 3, 8, 8)) * 0.3
    gamma = 1.0 + 0.1 * _rand(k[2], (8,))
    beta = 0.1 * _rand(k[3], (8,))
    got = fused_conv_gn_gelu(x, w, gamma, beta, residual=res, interpret=True)
    want = _flax_half(x, w, gamma, beta, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_bf16_inputs():
    k = jax.random.split(jax.random.key(2), 4)
    x = _rand(k[0], (1, 8, 8, 16), jnp.bfloat16)
    w = (_rand(k[1], (3, 3, 16, 16)) * 0.3)
    gamma = jnp.ones((16,))
    beta = jnp.zeros((16,))
    got = fused_conv_gn_gelu(x, w, gamma, beta, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _flax_half(x.astype(jnp.float32), w, gamma, beta)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.05, rtol=0.05)


def test_gradients_match_composition():
    """The custom VJP recomputes through the XLA composition — grads must
    equal differentiating the flax half directly."""
    k = jax.random.split(jax.random.key(3), 4)
    x = _rand(k[0], (1, 6, 6, 8))
    w = _rand(k[1], (3, 3, 8, 8)) * 0.3
    gamma = 1.0 + 0.1 * _rand(k[2], (8,))
    beta = 0.1 * _rand(k[3], (8,))

    def loss_fused(x, w, gamma, beta):
        return jnp.sum(
            fused_conv_gn_gelu(x, w, gamma, beta, interpret=True) ** 2
        )

    def loss_flax(x, w, gamma, beta):
        return jnp.sum(_flax_half(x, w, gamma, beta) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    g_flax = jax.grad(loss_flax, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    for gf, gx in zip(g_fused, g_flax):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=1e-3, rtol=1e-3)


def test_doubleconv_fused_same_tree_and_values():
    """DoubleConv(fused_narrow=True) must declare the IDENTICAL parameter
    tree as the unfused model (checkpoint compatibility) and produce the
    same outputs from the same params — both modes (plain + residual),
    with the Pallas path forced via the interpret hook."""
    from diffusionmodelscustom_tpu.models.unet import DoubleConv
    from diffusionmodelscustom_tpu.ops import fused_conv_gn

    x = _rand(jax.random.key(0), (2, 8, 8, 16))
    for residual, out_ch in ((False, 16), (True, 16)):
        ref_mod = DoubleConv(out_ch, residual=residual)
        fus_mod = DoubleConv(out_ch, residual=residual, fused_narrow=True)
        params = ref_mod.init(jax.random.key(1), x)["params"]
        fus_params = fus_mod.init(jax.random.key(1), x)["params"]
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(fus_params)
        for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(fus_params),
        ):
            assert a.shape == b.shape, kp
        want = ref_mod.apply({"params": params}, x)
        fused_conv_gn._FORCE_INTERPRET = True
        try:
            got = fus_mod.apply({"params": params}, x)
        finally:
            fused_conv_gn._FORCE_INTERPRET = False
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)


def test_odd_width_rejected():
    x = jnp.zeros((1, 4, 5, 8))
    w = jnp.zeros((3, 3, 8, 8))
    with pytest.raises(AssertionError):
        fused_conv_gn_gelu(x, w, jnp.ones((8,)), jnp.zeros((8,)),
                           interpret=True)
