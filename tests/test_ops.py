"""Tests for embeddings, attention, norms, resize ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionmodelscustom_tpu.ops import (
    ImageSelfAttention,
    attention_core,
    instance_norm,
    pos_encoding_block,
    resize_image,
    sinusoidal_embedding,
    upsample_2x,
    pixel_shuffle,
)
from diffusionmodelscustom_tpu.ops.flash_attention import (
    _reference_attention,
    flash_attention,
)


class TestEmbeddings:
    def test_sinusoidal_matches_reference_loop(self):
        # Interleaved layout, n=10000: out[b,2i]=sin(x/n^(2i/d)),
        # out[b,2i+1]=cos(...) — the reference's double loop
        # (modules_DANRA_conditional.py:54-61), here re-coded in numpy.
        dim, n = 16, 10000.0
        x = np.array([0.0, 1.0, 17.0, 799.0])
        expected = np.zeros((4, dim))
        for b in range(4):
            for i in range(dim // 2):
                emb = x[b] / (n ** (2 * i / dim))
                expected[b, 2 * i] = np.sin(emb)
                expected[b, 2 * i + 1] = np.cos(emb)
        got = np.asarray(sinusoidal_embedding(jnp.asarray(x), dim))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_pos_encoding_block_matches_reference(self):
        # Block layout [sin|cos], inv_freq = 1/n^(arange(0,d,2)/d)
        # (modules_DANRA_conditional.py:203-211).
        dim, n = 8, 1000.0
        t = np.array([3.0, 100.0])
        inv_freq = 1.0 / (n ** (np.arange(0, dim, 2) / dim))
        angles = t[:, None] * inv_freq[None, :]
        expected = np.concatenate([np.sin(angles), np.cos(angles)], axis=-1)
        got = np.asarray(pos_encoding_block(jnp.asarray(t), dim, n=n))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestAttention:
    def test_attention_core_softmax_property(self):
        # uniform q,k -> attention is a mean over v
        q = jnp.zeros((1, 8, 2, 4))
        k = jnp.zeros((1, 8, 2, 4))
        v = jax.random.normal(jax.random.key(0), (1, 8, 2, 4))
        out = attention_core(q, k, v, use_flash=False)
        expected = jnp.broadcast_to(v.mean(axis=1, keepdims=True), v.shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)

    def test_image_self_attention_shapes(self):
        m = ImageSelfAttention(n_heads=4, use_ffn=True)
        x = jnp.zeros((2, 8, 8, 16))
        params = m.init(jax.random.key(0), x)
        out = m.apply(params, x)
        assert out.shape == x.shape

    def test_flash_matches_reference_interpret(self):
        # Run the Pallas kernel in interpret mode on CPU and compare with
        # the einsum path.
        import functools
        from jax.experimental import pallas as pl  # noqa: F401

        b, s, h, d = 2, 1024, 2, 32
        rng = jax.random.key(1)
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (b, s, h, d))
        k = jax.random.normal(kk, (b, s, h, d))
        v = jax.random.normal(kv, (b, s, h, d))
        expected = _reference_attention(q, k, v)

        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            got = flash_attention(q, k, v, block_q=256, block_k=256)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=2e-3, atol=2e-3
        )

    def test_flash_backward_matches_reference_interpret(self):
        # The Pallas dQ/dKV backward kernels must produce the same
        # gradients as differentiating the einsum reference.
        from jax.experimental.pallas import tpu as pltpu

        b, s, h, d = 1, 512, 2, 32
        rng = jax.random.key(2)
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (b, s, h, d))
        k = jax.random.normal(kk, (b, s, h, d))
        v = jax.random.normal(kv, (b, s, h, d))

        def loss_ref(q, k, v):
            return (_reference_attention(q, k, v) ** 2).sum()

        def loss_flash(q, k, v):
            return (flash_attention(q, k, v, block_q=256, block_k=256) ** 2).sum()

        want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        for g, w, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=5e-3, atol=5e-3,
                err_msg=f"d{name}",
            )

    def test_flash_fallback_small_seq(self):
        # tiny maps fall back to einsum (no grid launch)
        q = jax.random.normal(jax.random.key(0), (1, 64, 2, 8))
        out = flash_attention(q, q, q)
        assert out.shape == q.shape


class TestNormsResize:
    def test_instance_norm_zero_mean_unit_var(self):
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3)) * 5 + 3
        y = np.asarray(instance_norm(x))
        np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(axis=(1, 2)), 1.0, atol=1e-3)

    def test_resize_shapes(self):
        x = jnp.zeros((2, 8, 8, 3))
        assert resize_image(x, 16, 16).shape == (2, 16, 16, 3)
        assert resize_image(x, 4, 4, method="bicubic").shape == (2, 4, 4, 3)
        assert upsample_2x(x).shape == (2, 16, 16, 3)

    def test_pixel_shuffle(self):
        x = jnp.arange(16.0).reshape(1, 1, 1, 16)
        y = pixel_shuffle(x, 2)
        assert y.shape == (1, 2, 2, 4)

    def test_bilinear_resize_values(self):
        x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
        y = resize_image(x, 4, 4)
        assert float(y.min()) >= 1.0 and float(y.max()) <= 4.0


class TestFusedGroupNorm:
    def test_matches_flax_groupnorm_interpret(self):
        from flax import linen as nn
        from jax.experimental.pallas import tpu as pltpu

        from diffusionmodelscustom_tpu.ops.group_norm import _gn1

        x = jax.random.normal(jax.random.key(0), (3, 8, 8, 64)) * 2 + 1
        gamma = jax.random.normal(jax.random.key(1), (64,)) * 0.1 + 1
        beta = jax.random.normal(jax.random.key(2), (64,)) * 0.1

        ref_mod = nn.GroupNorm(num_groups=1)
        ref = ref_mod.apply(
            {"params": {"scale": gamma, "bias": beta}}, x
        )
        with pltpu.force_tpu_interpret_mode():
            got = _gn1(x, gamma, beta, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_interpret(self):
        from flax import linen as nn
        from jax.experimental.pallas import tpu as pltpu

        from diffusionmodelscustom_tpu.ops.group_norm import _gn1

        # per-sample elements must give >= 8 rows of 128 lanes (the
        # wrapper's fused-path gate; blocks need 8 sublanes minimum)
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 32))
        gamma = jnp.ones((32,)) * 1.3
        beta = jnp.zeros((32,))
        ref_mod = nn.GroupNorm(num_groups=1)

        def loss_ref(x, g, b):
            y = ref_mod.apply({"params": {"scale": g, "bias": b}}, x)
            return jnp.sum(y * y * 0.5 + y)

        def loss_fused(x, g, b):
            y = _gn1(x, g, b, 1e-5)
            return jnp.sum(y * y * 0.5 + y)

        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
        for g, w, name in zip(got, want, ("dx", "dgamma", "dbeta")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4,
                err_msg=name,
            )

    def test_fallback_for_nondividing_channels(self):
        from diffusionmodelscustom_tpu.ops.group_norm import fused_group_norm1

        x = jax.random.normal(jax.random.key(0), (2, 4, 4, 48))  # 48 !| 128
        out = fused_group_norm1(x, jnp.ones((48,)), jnp.zeros((48,)))
        m = float(np.asarray(out).mean())
        assert abs(m) < 1e-5  # normalized

    def test_wrapper_param_names_match_groupnorm(self):
        from diffusionmodelscustom_tpu.ops.group_norm import GroupNorm1

        m = GroupNorm1()
        params = m.init(jax.random.key(0), jnp.zeros((1, 4, 4, 32)))
        assert set(params["params"].keys()) == {"scale", "bias"}


class TestQKInt8Attention:
    """Serving-only dynamic-int8 QK attention (ops/flash_attention.py;
    the attention half of the danra128int8 serving mode)."""

    def _qkv(self, s=64, d=32):
        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(
            rng.standard_normal((2, s, 4, d)), jnp.float32
        )
        return mk(), mk(), mk()

    def test_close_to_exact(self):
        from diffusionmodelscustom_tpu.ops.attention import attention_core

        q, k, v = self._qkv()
        ref = attention_core(q, k, v, use_flash=False)
        i8 = attention_core(q, k, v, qk_int8=True)
        rel = float(jnp.max(jnp.abs(ref - i8))) / float(jnp.max(jnp.abs(ref)))
        assert rel < 0.05, rel

    def test_grad_raises(self):
        from diffusionmodelscustom_tpu.ops.attention import attention_core

        q, k, v = self._qkv(s=16, d=8)
        with pytest.raises(NotImplementedError, match="serving-only"):
            jax.grad(
                lambda qq: attention_core(qq, k, v, qk_int8=True).sum()
            )(q)

    def test_pv_int8_close_to_exact(self):
        # QK+PV int8 (both MXU contractions quantized): still within the
        # serving-mode tolerance of the exact path
        from diffusionmodelscustom_tpu.ops.attention import attention_core

        q, k, v = self._qkv()
        ref = attention_core(q, k, v, use_flash=False)
        i8 = attention_core(q, k, v, pv_int8=True)
        rel = float(jnp.max(jnp.abs(ref - i8))) / float(jnp.max(jnp.abs(ref)))
        assert rel < 0.05, rel

    def test_pv_int8_grad_raises(self):
        from diffusionmodelscustom_tpu.ops.attention import attention_core

        q, k, v = self._qkv(s=16, d=8)
        with pytest.raises(NotImplementedError, match="serving-only"):
            jax.grad(
                lambda qq: attention_core(qq, k, v, pv_int8=True).sum()
            )(q)

    def test_model_serving_mode_runs(self):
        # conv_quant=True now also quantizes attention QK; forward runs
        # and stays close to the exact model
        from diffusionmodelscustom_tpu.models import ConditionalUNet

        kw = dict(
            out_channels=1, base_channels=16, time_dim=32, n_heads=2,
            attention_levels=(1,), attention_levels_up=(1,),
        )
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
        t = jnp.zeros((2,), jnp.int32)
        exact = ConditionalUNet(**kw)
        params = exact.init(jax.random.key(1), x, t)
        y = exact.apply(params, x, t)
        yq = ConditionalUNet(conv_quant=True, **kw).apply(params, x, t)
        assert yq.shape == y.shape
        assert np.isfinite(np.asarray(yq)).all()
        # same parameters, approximate compute: outputs stay in the same
        # ballpark (the int8 delta bound is measured on TPU; this guards
        # against wiring errors like double scaling)
        denom = float(jnp.max(jnp.abs(y))) + 1e-6
        rel = float(jnp.max(jnp.abs(y - yq))) / denom
        assert rel < 0.35, rel
        # attn_pv_int8 stacks PV quantization on the same params
        ypv = ConditionalUNet(
            conv_quant=True, attn_pv_int8=True, **kw
        ).apply(params, x, t)
        assert ypv.shape == y.shape
        rel_pv = float(jnp.max(jnp.abs(y - ypv))) / denom
        assert rel_pv < 0.35, rel_pv
