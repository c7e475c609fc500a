"""Fused GN(G)+FiLM+SiLU+conv3x3 Pallas kernel vs the flax composition.

The kernel (ops/fused_norm_conv.py) targets the imagen ResnetBlock's
per-block unit (models/imagen/unet.py:108-175, reference
imagen_pytorch.py:1498-1650): GroupNorm(groups) -> optional per-sample
FiLM ``y*(scale+1)+shift`` -> SiLU -> biased 3x3 conv. Interpret mode
runs the Pallas program on CPU; numerics must match the flax oracle to
bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from diffusionmodelscustom_tpu.ops.fused_norm_conv import fused_gn_silu_conv


def _flax_unit(x, w, gamma, beta, bias, *, groups, fscale=None, fshift=None):
    class Unit(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.GroupNorm(num_groups=groups, epsilon=1e-6, name="gn")(h)
            if fscale is not None:
                h = h * (fscale[:, None, None, :] + 1.0) + \
                    fshift[:, None, None, :]
            h = nn.silu(h)
            return nn.Conv(w.shape[-1], (3, 3), padding=1, name="conv")(h)

    params = {"gn": {"scale": gamma, "bias": beta},
              "conv": {"kernel": w, "bias": bias}}
    return Unit().apply({"params": params}, x)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("groups,cin,cout", [(1, 8, 8), (4, 8, 16), (8, 16, 8)])
def test_matches_flax_composition(groups, cin, cout):
    k = jax.random.split(jax.random.key(0), 5)
    x = _rand(k[0], (2, 6, 8, cin))
    w = _rand(k[1], (3, 3, cin, cout)) * 0.3
    gamma = 1.0 + 0.1 * _rand(k[2], (cin,))
    beta = 0.1 * _rand(k[3], (cin,))
    bias = 0.1 * _rand(k[4], (cout,))
    got = fused_gn_silu_conv(x, w, gamma, beta, bias, groups=groups,
                             interpret=True)
    want = _flax_unit(x, w, gamma, beta, bias, groups=groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_film_conditioning():
    """Per-sample FiLM scale/shift between the norm and the activation —
    the ResnetBlock's time-embedding path."""
    k = jax.random.split(jax.random.key(1), 7)
    x = _rand(k[0], (3, 6, 8, 8))
    w = _rand(k[1], (3, 3, 8, 8)) * 0.3
    gamma = 1.0 + 0.1 * _rand(k[2], (8,))
    beta = 0.1 * _rand(k[3], (8,))
    bias = 0.1 * _rand(k[4], (8,))
    fs = 0.3 * _rand(k[5], (3, 8))
    fh = 0.3 * _rand(k[6], (3, 8))
    got = fused_gn_silu_conv(x, w, gamma, beta, bias, groups=4,
                             film_scale=fs, film_shift=fh, interpret=True)
    want = _flax_unit(x, w, gamma, beta, bias, groups=4, fscale=fs,
                      fshift=fh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # FiLM must actually matter
    base = fused_gn_silu_conv(x, w, gamma, beta, bias, groups=4,
                              interpret=True)
    assert float(jnp.abs(got - base).max()) > 1e-3


def test_bf16_inputs():
    k = jax.random.split(jax.random.key(2), 5)
    x = _rand(k[0], (2, 8, 8, 8), jnp.bfloat16)
    w = _rand(k[1], (3, 3, 8, 8)) * 0.3
    gamma = jnp.ones((8,))
    beta = jnp.zeros((8,))
    bias = jnp.zeros((8,))
    got = fused_gn_silu_conv(x, w, gamma, beta, bias, groups=2,
                             interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _flax_unit(x.astype(jnp.float32), w, gamma, beta, bias, groups=2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.15, rtol=0.15
    )


def test_gradients_match_reference():
    """Custom VJP (recompute through the XLA composition) == autodiff of
    the flax oracle, for every operand."""
    k = jax.random.split(jax.random.key(3), 7)
    x = _rand(k[0], (2, 4, 6, 8))
    w = _rand(k[1], (3, 3, 8, 8)) * 0.3
    gamma = 1.0 + 0.1 * _rand(k[2], (8,))
    beta = 0.1 * _rand(k[3], (8,))
    bias = 0.1 * _rand(k[4], (8,))
    fs = 0.3 * _rand(k[5], (2, 8))
    fh = 0.3 * _rand(k[6], (2, 8))

    def loss_fused(x, w, gamma, beta, bias, fs, fh):
        out = fused_gn_silu_conv(x, w, gamma, beta, bias, groups=4,
                                 film_scale=fs, film_shift=fh,
                                 interpret=True)
        return jnp.sum(out * out)

    def loss_ref(x, w, gamma, beta, bias, fs, fh):
        out = _flax_unit(x, w, gamma, beta, bias, groups=4, fscale=fs,
                         fshift=fh)
        return jnp.sum(out * out)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, w, gamma, beta, bias, fs, fh)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, w, gamma, beta, bias, fs, fh)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_odd_width_rejected():
    x = jnp.zeros((1, 4, 5, 8))
    w = jnp.zeros((3, 3, 8, 8))
    with pytest.raises(AssertionError):
        fused_gn_silu_conv(x, w, jnp.ones((8,)), jnp.zeros((8,)),
                           jnp.zeros((8,)), groups=2, interpret=True)


def test_imagen_unet_fused_narrow_param_tree_and_output():
    """ImagenUNet(fused_narrow=True) must share the unfused parameter
    tree byte-for-byte and (off-TPU, where the fused op routes through
    the XLA reference composition) produce the same outputs."""
    import jax
    from diffusionmodelscustom_tpu.models.imagen import ImagenUNet

    kw = dict(dim=16, dim_mults=(1, 2), channels=1, num_resnet_blocks=1,
              layer_attns=(False, False), layer_cross_attns=False,
              cond_on_text=False, attn_heads=2)
    a = ImagenUNet(**kw)
    b = ImagenUNet(**kw, fused_narrow=True)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
    nc = jnp.zeros((2,))
    pa = a.init(jax.random.key(1), x, nc)
    pb = b.init(jax.random.key(1), x, nc)
    ta = jax.tree_util.tree_structure(pa)
    tb = jax.tree_util.tree_structure(pb)
    assert ta == tb, f"param trees differ:\n{ta}\n{tb}"
    oa = a.apply(pa, x, nc)
    ob = b.apply(pb, x, nc)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                               atol=1e-4, rtol=1e-4)
