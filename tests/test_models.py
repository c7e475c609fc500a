"""Shape/dtype tests for the UNet family (the reference's only model tests
were shape smoke-tests, test/unet_test.py:129-159 — this is the pyramid
version)."""

import jax
import jax.numpy as jnp
import pytest

from diffusionmodelscustom_tpu.models import ConditionalUNet, DiffusionNet


class TestConditionalUNet:
    def _make(self, **kw):
        defaults = dict(
            out_channels=1,
            base_channels=16,
            time_dim=32,
            n_heads=4,
            num_classes=4,
            cond_img_channels=1,
            cond_on_lsm=True,
            cond_on_topo=True,
        )
        defaults.update(kw)
        return ConditionalUNet(**defaults)

    def test_forward_shapes(self):
        model = self._make()
        rng = jax.random.key(0)
        x = jnp.zeros((2, 32, 32, 1))
        t = jnp.array([10, 500])
        y = jnp.array([0, 3])
        cond = jnp.zeros((2, 8, 8, 1))  # low-res, gets upsampled
        lsm = jnp.zeros((2, 32, 32, 1))
        topo = jnp.zeros((2, 32, 32, 1))
        params = model.init(rng, x, t, y, cond, lsm, topo)
        out = model.apply(params, x, t, y, cond, lsm, topo)
        assert out.shape == (2, 32, 32, 1)
        assert out.dtype == x.dtype

    def test_null_conditioning_same_params(self):
        # CFG: the unconditional branch must run with the same params.
        model = self._make()
        x = jnp.zeros((2, 32, 32, 1))
        t = jnp.array([1, 2])
        params = model.init(
            jax.random.key(0), x, t, jnp.array([0, 1]),
            jnp.zeros((2, 8, 8, 1)), jnp.zeros((2, 32, 32, 1)),
            jnp.zeros((2, 32, 32, 1)),
        )
        out = model.apply(params, x, t, None, None, None, None)
        assert out.shape == (2, 32, 32, 1)

    def test_bfloat16_compute(self):
        model = self._make(dtype=jnp.bfloat16)
        x = jnp.zeros((1, 32, 32, 1), jnp.float32)
        t = jnp.array([3])
        params = model.init(jax.random.key(0), x, t)
        out = model.apply(params, x, t)
        assert out.shape == (1, 32, 32, 1)
        assert out.dtype == jnp.float32  # output cast back to input dtype
        # params stay f32
        leaf = jax.tree_util.tree_leaves(params)[0]
        assert leaf.dtype == jnp.float32

    def test_unconditional_variant(self):
        model = ConditionalUNet(
            out_channels=1, base_channels=16, time_dim=32, num_classes=None
        )
        x = jnp.zeros((1, 32, 32, 1))
        t = jnp.array([5])
        params = model.init(jax.random.key(0), x, t)
        assert model.apply(params, x, t).shape == (1, 32, 32, 1)


class TestDiffusionNet:
    def test_forward_shapes_and_batchstats(self):
        model = DiffusionNet(
            output_channels=1, time_embedding=64, n_heads=4, num_classes=4
        )
        x = jnp.zeros((2, 32, 32, 1))
        t = jnp.array([10, 700])
        y = jnp.array([1, 2])
        cond = jnp.zeros((2, 32, 32, 1))
        lsm = jnp.zeros((2, 32, 32, 1))
        topo = jnp.zeros((2, 32, 32, 1))
        variables = model.init(jax.random.key(0), x, t, y, cond, lsm, topo)
        assert "batch_stats" in variables  # ResNet encoder has BatchNorm

        # eval mode (running averages)
        out = model.apply(variables, x, t, y, cond, lsm, topo, train=False)
        assert out.shape == (2, 32, 32, 1)

        # train mode updates batch stats
        out, updates = model.apply(
            variables, x, t, y, cond, lsm, topo, train=True,
            mutable=["batch_stats"],
        )
        assert out.shape == (2, 32, 32, 1)
        assert "batch_stats" in updates

    def test_unconditional(self):
        model = DiffusionNet(output_channels=1, time_embedding=64)
        x = jnp.zeros((1, 32, 32, 1))
        t = jnp.array([9])
        variables = model.init(jax.random.key(0), x, t)
        out = model.apply(variables, x, t)
        assert out.shape == (1, 32, 32, 1)

    @pytest.mark.parametrize("size", [32])
    def test_resolutions(self, size):
        model = DiffusionNet(output_channels=2, time_embedding=32)
        x = jnp.zeros((1, size, size, 2))
        t = jnp.array([4])
        variables = model.init(jax.random.key(0), x, t)
        assert model.apply(variables, x, t).shape == (1, size, size, 2)


def test_danra_attn_head_dim_capping_preserves_params():
    """The TPU-first head-capping knob (attn_head_dim) must not change
    the parameter tree — a trained/imported checkpoint runs under any
    setting (qkv projections are head-count independent)."""
    import jax
    import jax.numpy as jnp

    from diffusionmodelscustom_tpu.models import DiffusionNet

    m0 = DiffusionNet(output_channels=1, time_embedding=32, n_heads=4)
    m1 = DiffusionNet(
        output_channels=1, time_embedding=32, n_heads=4, attn_head_dim=128
    )
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.zeros((1,), jnp.int32)
    v0 = m0.init(jax.random.key(0), x, t)
    v1 = m1.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, v0, v1)
    )
    out = m1.apply(v0, x, t, train=False)
    assert out.shape == (1, 32, 32, 1)
    assert bool(jnp.isfinite(out).all())


def test_build_model_honors_attention_level_config():
    """The round-5 config knobs unet.attention_levels(_up) reach the
    flagship constructor — a checkpoint trained with a non-default
    placement (e.g. the parity teacher's up=(2, 1)) can be restored
    through the CLI with a matching parameter tree."""
    from diffusionmodelscustom_tpu.cli.train import build_model
    from diffusionmodelscustom_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig().update({
        "unet.attention_levels": [1, 2],
        "unet.attention_levels_up": [2, 1],
    })
    model = build_model(cfg)
    assert tuple(model.attention_levels) == (1, 2)
    assert tuple(model.attention_levels_up) == (2, 1)
