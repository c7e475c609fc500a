"""Whole-domain spatially-sharded generation (round-2 VERDICT item 7;
SURVEY §5.7): `DanraDataset.full_domain_sample` + `cli.generate
--full_domain`, which shards image height over the mesh 'model' axis so
full grids (DANRA: 589x789) scale past one chip's memory. The reference
only ever samples cutouts (data_DANRA_conditional.py:818-860)."""

import numpy as np

from diffusionmodelscustom_tpu.data import (
    DanraDataset,
    DanraDatasetConfig,
    make_synthetic_store,
    synthetic_geography,
)


def _odd_domain_dataset(tmp_path, shape=(40, 56)):
    lsm, topo = synthetic_geography(shape)
    make_synthetic_store(tmp_path / "hr", n_days=4, shape=shape, lsm=lsm, seed=1)
    make_synthetic_store(tmp_path / "lr", n_days=4, shape=shape,
                         lowres_factor=4, seed=2)
    cfg = DanraDatasetConfig(
        data_size=(16, 16), conditional_seasons=True,
        conditional_images=True, n_classes=4, cutouts=True,
        cutout_domains=(0, shape[0], 0, shape[1]), cutout_size=32,
        sdf_weighted_loss=True,
    )
    return DanraDataset(tmp_path / "hr", cfg, cond_store_path=tmp_path / "lr",
                        lsm_full_domain=lsm, topo_full_domain=topo), lsm


class TestFullDomainSample:
    def test_padded_shapes_and_keys(self, tmp_path):
        ds, lsm = _odd_domain_dataset(tmp_path)
        s = ds.full_domain_sample(0)
        # 40x56 -> edge-padded to the /16 grid the UNet pyramid needs
        for key in ("img", "img_cond", "lsm", "topo", "sdf"):
            assert s[key].shape == (48, 64, 1), (key, s[key].shape)
        assert tuple(s["domain_shape"]) == (40, 56)
        assert s["classifier"].dtype == np.int32
        # scaling matches the cutout path's [-1, 1] Scale transform
        assert np.abs(s["img"]).max() <= 1.0 + 1e-6
        assert np.isfinite(s["img_cond"]).all()

    def test_edge_padding_replicates_border(self, tmp_path):
        ds, lsm = _odd_domain_dataset(tmp_path)
        s = ds.full_domain_sample(1)
        img = s["img"][..., 0]
        np.testing.assert_array_equal(img[40:, :56], np.tile(img[39, :56], (8, 1)))
        np.testing.assert_array_equal(img[:40, 56:], np.tile(img[:40, 55:56], (1, 8)))
        # geography keeps native units (lsm in {0,1}) at the full grid
        np.testing.assert_array_equal(
            s["lsm"][:40, :56, 0], lsm.astype(np.float32)
        )

    def test_no_padding_when_divisible(self, tmp_path):
        ds, _ = _odd_domain_dataset(tmp_path, shape=(32, 48))
        s = ds.full_domain_sample(0)
        assert s["img"].shape == (32, 48, 1)
        assert tuple(s["domain_shape"]) == (32, 48)


def test_generate_cli_full_domain(tmp_path):
    """cli.generate --full_domain on the 8-virtual-device mesh: one
    whole-domain field, height sharded over the 'model' axis."""
    from diffusionmodelscustom_tpu.cli.generate import main

    rc = main([
        "--platform", "cpu", "--synthetic", "--full_domain",
        "--n_samples", "1", "--sample_batch", "1", "--hr_size", "16",
        "--sampler", "ddim", "--ddim_steps", "4",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "diffusion.n_timesteps=20",
        "--set", "unet.base_channels=8",
    ])
    assert rc == 0
    out = tmp_path / "runs" / "generated_samples_full"
    gen = np.load(out / "gen_samples.npz")["data"]
    ev = np.load(out / "eval_samples.npz")["data"]
    # the synthetic full domain is 128x128 (build_data: max(2*hr, 128))
    assert gen.shape == (1, 128, 128, 1) and ev.shape[1:] == (128, 128, 1)
    assert np.isfinite(gen).all()
