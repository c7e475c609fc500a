"""Width-pair packed conv (ops/packed_conv.py) equivalence tests.

The packed formulation must be numerically interchangeable with a direct
3x3 conv — it is a pure reformulation for MXU lane utilization, not an
approximation (reference semantics: the DoubleConv convs,
DDPM_clean_application/src/unet_ms.py:30-49).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from diffusionmodelscustom_tpu.ops.packed_conv import (
    PackedConv3x3,
    pack_conv_weights,
    packed_pair_conv3x3,
)


def _direct(x, kernel):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "shape,cout",
    [
        ((2, 8, 8, 64), 64),
        ((2, 8, 8, 128), 64),  # up3.proj.conv1 site: pack both sides
        ((2, 8, 8, 4), 64),  # inc.conv1 site: tiny fan-in
        ((1, 16, 6, 64), 64),  # non-square, W even but not power of two
    ],
)
def test_packed_matches_direct_conv(shape, cout):
    kx, kw = jax.random.split(jax.random.key(shape[-1] + cout))
    x = jax.random.normal(kx, shape, jnp.float32)
    kernel = jax.random.normal(kw, (3, 3, shape[-1], cout), jnp.float32) * 0.1
    got = packed_pair_conv3x3(x, kernel)
    want = _direct(x, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_gradients_match_direct():
    kx, kw = jax.random.split(jax.random.key(7))
    x = jax.random.normal(kx, (2, 8, 8, 64), jnp.float32)
    kernel = jax.random.normal(kw, (3, 3, 64, 64), jnp.float32) * 0.1

    def loss_packed(x, k):
        return (packed_pair_conv3x3(x, k) ** 2).sum()

    def loss_direct(x, k):
        return (_direct(x, k) ** 2).sum()

    gx_p, gk_p = jax.grad(loss_packed, argnums=(0, 1))(x, kernel)
    gx_d, gk_d = jax.grad(loss_direct, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_d), rtol=2e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gk_p), np.asarray(gk_d), rtol=2e-4, atol=1e-4
    )


def test_pack_weights_doubles_each_element():
    w = jnp.ones((3, 3, 4, 4))
    w2 = pack_conv_weights(w)
    # each weight appears exactly twice (once per output parity)
    assert float(w2.sum()) == pytest.approx(2 * float(w.sum()))


def test_module_matches_nn_conv_params_and_output():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 32))
    ref = nn.Conv(64, (3, 3), padding=1, use_bias=False)
    ours = PackedConv3x3(64)
    pref = ref.init(jax.random.key(1), x)
    # identical parameter tree: a checkpoint from either loads in the other
    pours = ours.init(jax.random.key(1), x)
    assert (
        pref["params"]["kernel"].shape == pours["params"]["kernel"].shape
    )
    got = ours.apply(pref, x)
    want = ref.apply(pref, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_module_odd_width_falls_back():
    x = jax.random.normal(jax.random.key(0), (1, 7, 7, 16))
    m = PackedConv3x3(24)
    p = m.init(jax.random.key(1), x)
    out = m.apply(p, x)
    assert out.shape == (1, 7, 7, 24)
    ref = nn.Conv(24, (3, 3), padding=1, use_bias=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.apply(p, x)), atol=2e-5
    )


def test_flagship_doubleconv_matches_golden_math():
    """DoubleConv (plain nn.Conv path — the packed swap was reverted
    after the in-context regression) must match a hand-rolled
    conv/GN/GELU reference computation on the same parameters."""
    from diffusionmodelscustom_tpu.models.unet import DoubleConv

    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 64))
    dc = DoubleConv(64, residual=True)
    params = dc.init(jax.random.key(3), x)
    out = dc.apply(params, x)
    assert out.shape == x.shape

    # reference computation with plain convs from the same params
    k1 = params["params"]["conv1"]["kernel"]
    k2 = params["params"]["conv2"]["kernel"]
    gn1 = params["params"]["gn1"]
    gn2 = params["params"]["gn2"]

    def gn(v, p):
        mean = v.mean(axis=(1, 2, 3), keepdims=True)
        var = v.var(axis=(1, 2, 3), keepdims=True)
        return (v - mean) / jnp.sqrt(var + 1e-6) * p["scale"] + p["bias"]

    h = _direct(x, k1)
    h = gn(h, gn1)
    h = nn.gelu(h)
    h = _direct(h, k2)
    h = gn(h, gn2)
    want = nn.gelu(x + h)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=1e-4, rtol=1e-4
    )
