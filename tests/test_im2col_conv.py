"""im2col conv kernel: exactness vs the XLA conv, VJP, module drop-in."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodelscustom_tpu.ops import im2col_conv as mod
from diffusionmodelscustom_tpu.ops.im2col_conv import (
    Im2ColConv3x3,
    im2col_conv3x3,
)


def _pair(b=2, h=16, w=16, cin=8, cout=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32) * 0.1
    return x, k


def test_fallback_matches_xla_conv():
    # off-TPU without the interpret hook: the public op is the XLA conv
    x, k = _pair()
    out = im2col_conv3x3(x, k)
    ref = mod._reference_conv(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_exact_in_interpret_mode():
    # force the Pallas path (interpret) and compare against the XLA conv
    x, k = _pair(b=2, h=16, w=12, cin=8, cout=16)
    ref = mod._reference_conv(x, k)
    mod._FORCE_INTERPRET = True
    try:
        out = im2col_conv3x3(x, k)
    finally:
        mod._FORCE_INTERPRET = False
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_kernel_interpret_edge_rows_zero_padded():
    # all-ones input exposes halo mistakes at the image borders
    x = jnp.ones((1, 8, 8, 8))
    k = jnp.ones((3, 3, 8, 4))
    ref = mod._reference_conv(x, k)
    mod._FORCE_INTERPRET = True
    try:
        out = im2col_conv3x3(x, k)
    finally:
        mod._FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_vjp_matches_xla_conv_vjp():
    x, k = _pair(b=1, h=8, w=8, cin=4, cout=4)

    def loss_kernel(xx, kk):
        return jnp.sum(im2col_conv3x3(xx, kk) ** 2)

    def loss_ref(xx, kk):
        return jnp.sum(mod._reference_conv(xx, kk) ** 2)

    gx1, gk1 = jax.grad(loss_kernel, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), atol=1e-4)


def test_module_param_tree_matches_nn_conv():
    from flax import linen as nn

    x, _ = _pair(cin=8, cout=8)
    m1 = Im2ColConv3x3(8)
    m2 = nn.Conv(8, (3, 3), padding=1, use_bias=False)
    p1 = m1.init(jax.random.key(0), x)
    p2 = m2.init(jax.random.key(0), x)
    s1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p1)
    s2 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p2)
    assert s1 == s2
    # same params -> same output (fallback path off-TPU)
    y1 = m1.apply(p2, x)
    y2 = m2.apply(p2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_non_tiling_height_falls_back():
    x, k = _pair(h=10, w=16)  # 10 % 8 != 0
    out = im2col_conv3x3(x, k)
    ref = mod._reference_conv(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
