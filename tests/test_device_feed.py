"""Compact device feed: pack/unpack roundtrip, device-side geo
reconstruction vs the host load_batch ground truth, fused train step.

The feed replaces the reference's per-sample host geo pipeline
(data_DANRA_conditional.py:1118-1190) with a single packed H2D buffer and
an on-device finisher (data/device_feed.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodelscustom_tpu.data.dataset import (
    DanraDataset,
    DanraDatasetConfig,
)
from diffusionmodelscustom_tpu.data.device_feed import (
    CompactBatcher,
    CompactSpec,
    DeviceGeoFinisher,
    make_compact_train_step,
    pack_compact,
    unpack_compact,
)
from diffusionmodelscustom_tpu.data.synthetic import (
    make_synthetic_store,
    synthetic_geography,
)


@pytest.fixture(scope="module")
def stores(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("feed")
    lsm, topo = synthetic_geography((64, 64))
    make_synthetic_store(
        tmp_path / "hr", n_days=8, shape=(64, 64), lsm=lsm, seed=1
    )
    make_synthetic_store(
        tmp_path / "lr", n_days=8, shape=(64, 64), lowres_factor=4, seed=2
    )
    return tmp_path, lsm, topo


def _full_cfg(**over):
    kw = dict(
        data_size=(32, 32),
        conditional_seasons=True,
        conditional_images=True,
        n_classes=4,
        cutouts=True,
        cutout_domains=[0, 64, 0, 64],
        cutout_size=32,
        sdf_weighted_loss=True,
        n_samples=8,
    )
    kw.update(over)
    return DanraDatasetConfig(**kw)


def _dataset(stores, **over):
    tmp_path, lsm, topo = stores
    return DanraDataset(
        tmp_path / "hr",
        _full_cfg(**over),
        cond_store_path=tmp_path / "lr",
        lsm_full_domain=lsm,
        topo_full_domain=topo,
    )


class TestPackUnpack:
    def test_roundtrip_is_bf16_exact(self, stores):
        ds = _dataset(stores)
        host = ds.load_batch([0, 1, 2, 3])
        spec = CompactSpec.for_dataset(ds, 4)
        buf = pack_compact(host, spec)
        assert buf.dtype == np.uint16
        out = unpack_compact(jnp.asarray(buf), spec)
        # img survives exactly at bf16 precision
        np.testing.assert_array_equal(
            np.asarray(out["img"], np.float32),
            np.asarray(host["img"], np.float32).astype(jnp.bfloat16),
        )
        np.testing.assert_array_equal(
            np.asarray(out["classifier"]), host["classifier"]
        )
        np.testing.assert_array_equal(np.asarray(out["points"]), host["points"])

    def test_byte_budget(self, stores):
        # the whole point: compact bytes << full host batch bytes
        ds = _dataset(stores)
        host = ds.load_batch([0, 1, 2, 3])
        spec = CompactSpec.for_dataset(ds, 4)
        compact_bytes = pack_compact(host, spec).nbytes
        full_bytes = sum(
            np.asarray(v).astype(np.float32).nbytes for v in host.values()
        )
        assert compact_bytes < full_bytes / 3

    def test_out_of_range_label_raises(self, stores):
        ds = _dataset(stores)
        host = ds.load_batch([0, 1, 2, 3])
        spec = CompactSpec.for_dataset(ds, 4)
        bad = dict(host)
        bad["classifier"] = host["classifier"] - 5
        with pytest.raises(ValueError, match="uint16"):
            pack_compact(bad, spec)


class TestFinisherMatchesHost:
    def test_geo_fields_match_host_pipeline(self, stores):
        # cutout_size == data_size: host resize is identity, so the device
        # reconstruction must match the host fields up to EDT fp tolerance
        ds = _dataset(stores)
        host = ds.load_batch([0, 1, 2, 3])
        spec = CompactSpec.for_dataset(ds, 4)
        fin = DeviceGeoFinisher(
            spec, lsm_full=ds.lsm_full, topo_full=ds.topo_full
        )
        out = jax.jit(fin)(jnp.asarray(pack_compact(host, spec)))
        assert set(out) >= {"img", "img_cond", "lsm", "topo", "sdf"}
        for key, tol in (("lsm", 1e-5), ("topo", 1e-5), ("sdf", 1e-4)):
            np.testing.assert_allclose(
                np.asarray(out[key]),
                np.asarray(host[key]),
                atol=tol,
                err_msg=key,
            )
        # shipped fields: bf16 wire quantization only
        np.testing.assert_allclose(
            np.asarray(out["img"]), host["img"], atol=0.01
        )
        np.testing.assert_allclose(
            np.asarray(out["img_cond"]), host["img_cond"], atol=0.01
        )

    def test_small_cond_feed_upsamples(self, stores):
        ds = _dataset(stores)
        batcher = CompactBatcher(ds, 4, cond_size=(16, 16))
        buf = batcher.load([0, 1, 2, 3])
        fin = batcher.make_finisher()
        out = jax.jit(fin)(jnp.asarray(buf))
        assert out["img_cond"].shape == (4, 32, 32, 1)
        # the 16px feed upsampled must approximate the 32px host cond
        host = ds.load_batch([0, 1, 2, 3])
        err = np.abs(np.asarray(out["img_cond"]) - host["img_cond"]).mean()
        assert err < 0.25

    def test_no_cutout_config_builds_finisher(self, stores):
        # cfg.cutouts=False: no points, so no geo reconstruction even
        # though the dataset holds full-domain lsm/topo (the host path's
        # "if cfg.cutouts and geo_fields" gating, mirrored)
        ds = _dataset(stores, cutouts=False, sdf_weighted_loss=False,
                      data_size=(64, 64))
        batcher = CompactBatcher(ds, 2)
        spec = batcher.spec
        assert not (spec.want_lsm or spec.want_topo or spec.want_sdf)
        assert not spec.has_points
        out = jax.jit(batcher.make_finisher())(
            jnp.asarray(batcher.load([0, 1]))
        )
        assert out["img"].shape == (2, 64, 64, 1)
        assert "lsm" not in out and "sdf" not in out and "topo" not in out

    def test_requires_points_for_geo(self):
        spec = CompactSpec(
            batch=2, data_size=(8, 8), want_lsm=True, cutout_size=8
        )
        with pytest.raises(ValueError, match="points"):
            DeviceGeoFinisher(spec, lsm_full=np.ones((16, 16)))


class TestCompactTrainStep:
    def test_fused_step_runs_and_matches_direct(self, stores):
        from diffusionmodelscustom_tpu.core.ddpm import GaussianDiffusion
        from diffusionmodelscustom_tpu.models.unet import ConditionalUNet
        from diffusionmodelscustom_tpu.train.trainer import (
            Trainer,
            TrainerConfig,
        )

        ds = _dataset(stores)
        model = ConditionalUNet(
            out_channels=1, base_channels=8, channel_mults=(1, 2),
            n_heads=1, attention_levels=(), attention_levels_up=(),
            num_classes=4, cond_img_channels=1,
            cond_on_lsm=True, cond_on_topo=True,
        )
        diff = GaussianDiffusion.create(n_timesteps=20)
        trainer = Trainer(
            model, diff, TrainerConfig(loss="sdfweighted", learning_rate=1e-3)
        )
        batcher = CompactBatcher(ds, 4)
        buf = jnp.asarray(batcher.load([0, 1, 2, 3]))
        fin = batcher.make_finisher()
        example = jax.jit(fin)(buf)
        state = trainer.init_state(jax.random.key(0), example)
        step = make_compact_train_step(trainer, fin)
        rng = jax.random.key(1)
        # direct: reconstruct then run the raw impl — must be identical
        # (same inputs, same rng), proving the fused jit changes nothing
        direct_state, direct_metrics = jax.jit(
            trainer._train_step_impl
        )(state, example, rng)
        state2 = trainer.init_state(jax.random.key(0), example)
        fused_state, fused_metrics = step(state2, buf, rng)
        np.testing.assert_allclose(
            float(fused_metrics["loss"]), float(direct_metrics["loss"]),
            rtol=1e-5,
        )
        leaves_a = jax.tree_util.tree_leaves(fused_state.params)
        leaves_b = jax.tree_util.tree_leaves(direct_state.params)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    def test_sharded_buffer_step_matches_single_device(self, stores):
        # the packed buffer is (batch, n_per_sample) so the mesh data
        # axis shards it like any other batch leaf; the finisher's
        # dynamic_slice gathers run against the replicated full-domain
        # geography — loss and updated params must match single-device
        from diffusionmodelscustom_tpu.core.ddpm import GaussianDiffusion
        from diffusionmodelscustom_tpu.models.unet import ConditionalUNet
        from diffusionmodelscustom_tpu.parallel import (
            batch_sharding,
            make_mesh,
            state_sharding,
        )
        from diffusionmodelscustom_tpu.train.trainer import (
            Trainer,
            TrainerConfig,
        )

        ds = _dataset(stores)
        model = ConditionalUNet(
            out_channels=1, base_channels=8, channel_mults=(1, 2),
            n_heads=1, attention_levels=(), attention_levels_up=(),
            num_classes=4, cond_img_channels=1,
            cond_on_lsm=True, cond_on_topo=True,
        )
        diff = GaussianDiffusion.create(n_timesteps=20)
        batcher = CompactBatcher(ds, 8)
        fin = batcher.make_finisher()
        trainer = Trainer(
            model, diff,
            TrainerConfig(loss="sdfweighted", ema=False),
            batch_finisher=fin,
        )
        buf = jnp.asarray(batcher.load(list(range(8))))
        example = jax.jit(fin)(buf)
        state = trainer.init_state(jax.random.key(0), example)
        rng = jax.random.key(2)

        state_single, m_single = trainer.train_step(
            jax.tree_util.tree_map(jnp.copy, state), buf, rng
        )

        mesh = make_mesh(8, 1)
        buf_sh = jax.device_put(buf, batch_sharding(mesh))
        st_spec = state_sharding(mesh, state)
        state_sh = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
            state, st_spec,
        )
        with mesh:
            state_multi, m_multi = trainer.train_step(state_sh, buf_sh, rng)

        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_multi["loss"]), rtol=1e-5
        )
        l1 = jax.tree_util.tree_leaves(state_single.params)[0]
        l2 = jax.tree_util.tree_leaves(state_multi.params)[0]
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-6
        )
