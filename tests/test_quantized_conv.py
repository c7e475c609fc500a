"""Dynamic int8 conv (ops/quantized_conv.py) — the serving-only path."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodelscustom_tpu.ops.quantized_conv import (
    DynamicInt8Conv3x3,
    dynamic_int8_conv3x3,
    quantize_conv_kernel,
    quantize_tensor,
)


def _direct(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_weight_quant_round_trip():
    k = jax.random.normal(jax.random.key(0), (3, 3, 16, 32)) * 0.3
    q, s = quantize_conv_kernel(k)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    back = q.astype(jnp.float32) * s
    # per-channel symmetric int8: worst-case error is half a step
    step = np.asarray(s)
    err = np.abs(np.asarray(back - k))
    assert (err <= step[None, None, None, :] * 0.5 + 1e-7).all()


def test_activation_quant_scale():
    x = jnp.array([[-2.0, 1.0], [0.5, 1.99]])
    q, s = quantize_tensor(x)
    assert q.dtype == jnp.int8
    assert float(s) == np.float32(2.0 / 127.0)
    assert int(q[0, 0]) == -127


def test_int8_conv_close_to_float():
    kx, kw = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (2, 8, 8, 32))
    k = jax.random.normal(kw, (3, 3, 32, 32)) * 0.1
    got = dynamic_int8_conv3x3(x, k)
    want = _direct(x, k)
    denom = float(jnp.abs(want).max())
    rel = float(jnp.abs(got - want).max()) / denom
    # two int8 quantizations -> ~1% relative is the expected regime
    assert rel < 0.05, rel


def test_module_param_tree_matches_nn_conv():
    from flax import linen as nn

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
    ref = nn.Conv(32, (3, 3), padding=1, use_bias=False)
    q = DynamicInt8Conv3x3(32)
    pref = ref.init(jax.random.key(1), x)
    # a trained checkpoint loads into the quantized serving module as-is
    out = q.apply(pref, x)
    want = ref.apply(pref, x)
    rel = float(jnp.abs(out - want).max() / (jnp.abs(want).max() + 1e-9))
    assert out.shape == want.shape and rel < 0.05


def test_flagship_conv_quant_sampling_close_and_finite():
    """End-to-end: the quantized flagship forward stays within ~2% of the
    exact one on identical parameters (serving-accuracy contract)."""
    from diffusionmodelscustom_tpu.models import ConditionalUNet

    kwargs = dict(
        out_channels=1, base_channels=16, time_dim=32, n_heads=2,
        attention_levels=(2,), attention_levels_up=(2,),
    )
    exact = ConditionalUNet(**kwargs)
    quant = ConditionalUNet(conv_quant=True, **kwargs)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
    t = jnp.full((2,), 5, jnp.int32)
    params = exact.init(jax.random.key(1), x, t)["params"]
    a = exact.apply({"params": params}, x, t)
    b = quant.apply({"params": params}, x, t)
    assert bool(jnp.isfinite(b).all())
    rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
    assert rel < 0.05, rel


def test_grad_through_int8_conv_raises():
    import pytest as _pytest

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
    k = jax.random.normal(jax.random.key(1), (3, 3, 16, 16)) * 0.1
    with _pytest.raises(NotImplementedError):
        jax.grad(lambda k: dynamic_int8_conv3x3(x, k).sum())(k)


def test_int8_module_bias_variant_matches_nn_conv_tree():
    from flax import linen as nn

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
    ref = nn.Conv(32, (3, 3), padding=1)  # use_bias=True default
    q = DynamicInt8Conv3x3(32, use_bias=True)
    pref = ref.init(jax.random.key(1), x)
    out = q.apply(pref, x)
    want = ref.apply(pref, x)
    rel = float(jnp.abs(out - want).max() / (jnp.abs(want).max() + 1e-9))
    assert out.shape == want.shape and rel < 0.05


def test_imagen_unet_conv_quant_close_and_finite():
    """Cascade serving mode: ImagenUNet(conv_quant=True) stays within a
    few percent of the exact forward on identical parameters; the
    parameter tree is unchanged (trained checkpoints load either way)."""
    from diffusionmodelscustom_tpu.models.imagen import ImagenUNet

    kwargs = dict(
        dim=128, dim_mults=(1,), channels=3, num_resnet_blocks=1,
        layer_attns=(False,), layer_cross_attns=(False,),
        attn_heads=2, learned_sinu_dim=8, attend_at_middle=False,
    )
    exact = ImagenUNet(**kwargs)
    quant = ImagenUNet(conv_quant=True, **kwargs)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    nc = jnp.zeros((2,))
    params = exact.init(jax.random.key(1), x, nc)
    a = exact.apply(params, x, nc)
    b = quant.apply(params, x, nc)
    assert bool(jnp.isfinite(b).all())
    rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
    assert rel < 0.08, rel
    # grad through the quantized cascade raises, not silently zeros
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        jax.grad(
            lambda p: quant.apply(p, x, nc).sum()
        )(params)
