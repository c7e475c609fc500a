"""Tests for the evaluation metric suite."""

import numpy as np
import pytest

from diffusionmodelscustom_tpu.evaluation import (
    crps_ensemble,
    daily_errors,
    evaluate_fields,
    heidke_skill_score,
    masked_mae,
    masked_rmse,
    mean_bias,
    morans_i,
    peirce_skill_score,
    pixel_distribution,
    pixel_errors,
)


def test_masked_errors_respect_mask():
    gen = np.ones((4, 4))
    ref = np.zeros((4, 4))
    # perfect on land, wrong on sea: error counted only on land
    gen[:2] = 0.0
    mask = np.zeros((4, 4), bool)
    mask[:2] = True  # land = first two rows (where gen == ref)
    assert masked_mae(gen, ref, mask) == 0.0
    assert masked_rmse(gen, ref, mask) == 0.0
    # unmasked: half the pixels are wrong by 1
    assert masked_mae(gen, ref, None) == pytest.approx(0.5)


def test_daily_and_pixel_errors_shapes():
    rng = np.random.default_rng(0)
    gen = rng.normal(size=(5, 8, 8))
    ref = rng.normal(size=(5, 8, 8))
    mae, rmse = daily_errors(gen, ref)
    assert mae.shape == (5,)
    assert np.all(rmse >= mae * 0)  # finite
    pmae, prmse = pixel_errors(gen, ref)
    assert pmae.shape == (8, 8)


def test_bias_sign():
    assert mean_bias(np.full((2, 2), 2.0), np.zeros((2, 2))) == pytest.approx(2.0)


def test_crps_perfect_forecast_zero():
    obs = np.random.default_rng(1).normal(size=(8, 8))
    ens = np.stack([obs] * 5)
    assert crps_ensemble(ens, obs) == pytest.approx(0.0, abs=1e-12)
    # degraded ensemble has positive CRPS
    ens2 = ens + np.random.default_rng(2).normal(size=ens.shape)
    assert crps_ensemble(ens2, obs) > 0.0


def test_crps_beats_single_member_for_spread():
    rng = np.random.default_rng(3)
    obs = rng.normal(size=(16, 16))
    # ensemble centred on obs with noise vs single biased member
    good = obs[None] + 0.5 * rng.normal(size=(10, 16, 16))
    bad = obs[None] + 2.0 + 0.0 * rng.normal(size=(10, 16, 16))
    assert crps_ensemble(good, obs) < crps_ensemble(bad, obs)


def test_morans_i_spatial_structure():
    # smooth gradient -> strong positive autocorrelation
    smooth = np.add.outer(np.arange(16.0), np.arange(16.0))
    assert morans_i(smooth) > 0.9
    # checkerboard -> strong negative
    checker = np.indices((16, 16)).sum(axis=0) % 2
    assert morans_i(checker.astype(float)) < -0.9


def test_skill_scores_perfect_and_random():
    rng = np.random.default_rng(4)
    ref = rng.normal(size=(32, 32))
    assert heidke_skill_score(ref, ref, 0.0) == pytest.approx(1.0)
    assert peirce_skill_score(ref, ref, 0.0) == pytest.approx(1.0)
    # anti-correlated forecast -> negative skill
    assert heidke_skill_score(-ref, ref, 0.0) < 0


def test_pixel_distribution_density():
    hist, edges = pixel_distribution(np.random.default_rng(5).normal(size=(50, 8, 8)))
    widths = np.diff(edges)
    assert np.sum(hist * widths) == pytest.approx(1.0, rel=1e-6)


def test_evaluate_fields_scorecard():
    rng = np.random.default_rng(6)
    ref = rng.normal(size=(6, 16, 16))
    gen = ref + 0.1 * rng.normal(size=ref.shape)
    lsm = np.ones((16, 16))
    out = evaluate_fields(gen, ref, lsm, event_threshold=0.0)
    for key in ("mae", "rmse", "bias", "daily_mae_mean", "morans_i_gen",
                "heidke", "peirce"):
        assert key in out and np.isfinite(out[key])
    assert out["mae"] < 0.2
    assert out["heidke"] > 0.5


class TestFID:
    def test_identical_sets_zero_and_same_distribution_small(self):
        from diffusionmodelscustom_tpu.evaluation.fid import fid

        rng = np.random.default_rng(0)
        a = rng.normal(5.0, 2.0, (200, 16, 16))
        b = rng.normal(5.0, 2.0, (200, 16, 16))
        assert fid(a, a.copy()) < 1e-8  # identical sample sets -> 0
        # same distribution: small (finite-sample bias) vs a shifted one
        d_same = fid(a, b)
        d_shift = fid(a + 3.0, b)
        assert d_same < d_shift / 5

    def test_monotone_in_distribution_shift(self):
        from diffusionmodelscustom_tpu.evaluation.fid import fid

        rng = np.random.default_rng(1)
        ref = rng.normal(0.0, 1.0, (200, 16, 16))
        d1 = fid(rng.normal(0.5, 1.0, (200, 16, 16)), ref)
        d2 = fid(rng.normal(2.0, 1.0, (200, 16, 16)), ref)
        d3 = fid(rng.normal(8.0, 1.0, (200, 16, 16)), ref)
        assert d1 < d2 < d3

    def test_frechet_distance_closed_form(self):
        from diffusionmodelscustom_tpu.evaluation.fid import frechet_distance

        # isotropic Gaussians: d^2 = |mu|^2 + (sqrt(a)-sqrt(b))^2 * dim
        dim = 4
        a, b = 2.0, 0.5
        mu = np.zeros(dim)
        mu2 = np.full(dim, 3.0)
        d = frechet_distance(mu, a * np.eye(dim), mu2, b * np.eye(dim))
        want = 9.0 * dim + (np.sqrt(a) - np.sqrt(b)) ** 2 * dim
        np.testing.assert_allclose(d, want, rtol=1e-6)

    def test_fixed_weight_cnn_features_default_and_stable(self):
        """The shipped fid_weights.npz makes FID a constant of the
        codebase: weights load offline, fid(gen,gen)~0, monotone under
        noise, and identical across processes (VERDICT r1 item 10)."""
        from diffusionmodelscustom_tpu.evaluation.fid import (
            _WEIGHTS_FILE,
            fid,
            pretrained_cnn_features,
        )

        assert _WEIGHTS_FILE.exists(), "fid_weights.npz must ship in-repo"
        rng = np.random.default_rng(3)
        gen = rng.standard_normal((64, 32, 32))
        assert abs(fid(gen, gen.copy())) < 1e-6
        vals = [
            fid(gen + rng.standard_normal(gen.shape) * s, gen)
            for s in (0.1, 0.5, 2.0)
        ]
        assert vals[0] < vals[1] < vals[2]
        # deterministic: two independent featurizations agree exactly
        f1 = pretrained_cnn_features(gen)
        f2 = pretrained_cnn_features(gen.copy())
        np.testing.assert_array_equal(f1, f2)
        assert f1.shape == (64, 128)

    def test_numpy_conv_matches_lax(self):
        """The pure-numpy stride-2 SAME conv (backend-independence fix:
        the jitted extractor drifted ~0.2% between TPU and CPU backends)
        agrees with lax.conv_general_dilated on odd/even shapes."""
        import jax.numpy as jnp
        from jax import lax

        from diffusionmodelscustom_tpu.evaluation.fid import (
            _conv2d_stride2_same,
        )

        rng = np.random.default_rng(0)
        for h, w_, kh in ((32, 32, 5), (31, 29, 3), (9, 8, 3)):
            x = rng.standard_normal((3, h, w_, 2))
            w = rng.standard_normal((kh, kh, 2, 4))
            ours = _conv2d_stride2_same(x, w)
            ref = lax.conv_general_dilated(
                jnp.asarray(x), jnp.asarray(w), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            assert ours.shape == ref.shape
            np.testing.assert_allclose(ours, np.asarray(ref), atol=2e-4)

    def test_fixed_weights_match_generator(self):
        """The committed file equals make_feature_net_weights(seed=7) —
        documents provenance of the shipped weights."""
        from diffusionmodelscustom_tpu.evaluation.fid import (
            _WEIGHTS_FILE,
            make_feature_net_weights,
        )

        want = make_feature_net_weights(seed=7)
        with np.load(_WEIGHTS_FILE) as z:
            for k, v in want.items():
                np.testing.assert_array_equal(z[k], v)

    def test_custom_feature_fn(self):
        from diffusionmodelscustom_tpu.evaluation.fid import fid

        feats = lambda x: x.reshape(len(x), -1)[:, :8]
        rng = np.random.default_rng(2)
        a = rng.normal(0, 1, (100, 4, 4))
        assert fid(a, a.copy(), feature_fn=feats) < 1e-8


class TestPlannedMetrics:
    """The reference's full planned-metrics list
    (evaluation_DANRA_conditional.py:251-257) — now all implemented."""

    def test_spatial_bias_map(self):
        from diffusionmodelscustom_tpu.evaluation.metrics import spatial_bias

        rng = np.random.default_rng(0)
        ref = rng.normal(0, 1, (50, 8, 8))
        gen = ref + 2.0  # constant bias
        m = spatial_bias(gen, ref)
        assert m.shape == (8, 8)
        np.testing.assert_allclose(m, 2.0, atol=0.01)

    def test_temporal_bias_series(self):
        from diffusionmodelscustom_tpu.evaluation.metrics import temporal_bias

        rng = np.random.default_rng(1)
        ref = rng.normal(0, 1, (10, 8, 8))
        drift = np.arange(10)[:, None, None].astype(float)
        series = temporal_bias(ref + drift, ref)
        np.testing.assert_allclose(series, np.arange(10), atol=1e-9)

    def test_extreme_value_stats(self):
        from diffusionmodelscustom_tpu.evaluation.metrics import extreme_value_stats

        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (100, 16, 16))
        ev = extreme_value_stats(x)
        assert ev["q0.9"] < ev["q0.99"] < ev["q0.999"]
        assert ev["block_maxima_mean"] > ev["q0.99"]


class TestPSD:
    def test_rapsd_parseval_and_shape(self):
        from diffusionmodelscustom_tpu.evaluation import rapsd

        rng = np.random.default_rng(0)
        f = rng.normal(size=(64, 64))
        k, p = rapsd(f)
        assert k.shape == p.shape == (32,)
        assert np.all(p > 0)
        # white noise: flat spectrum (low-k mean within 2x of high-k mean)
        lo, hi = p[:8].mean(), p[-8:].mean()
        assert 0.5 < lo / hi < 2.0

    def test_rapsd_smooth_field_concentrates_low_k(self):
        from diffusionmodelscustom_tpu.evaluation import rapsd

        y, x = np.mgrid[0:64, 0:64]
        f = np.sin(2 * np.pi * 2 * x / 64)  # single low wavenumber
        k, p = rapsd(f)
        assert p[1] == p.max()  # k=2 bin dominates
        assert p[1] > 100 * p[20]

    def test_psd_distance_zero_for_identical_and_detects_smoothing(self):
        from diffusionmodelscustom_tpu.evaluation import psd_distance

        rng = np.random.default_rng(1)
        truth = rng.normal(size=(10, 64, 64))
        assert psd_distance(truth, truth) < 1e-12
        # box-smoothed gen loses high-k power -> positive distance,
        # larger for stronger smoothing
        def smooth(x, w):
            k = np.ones((w, w)) / (w * w)
            from numpy.lib.stride_tricks import sliding_window_view

            pad = np.pad(x, ((0, 0), (w // 2, w - 1 - w // 2),
                             (w // 2, w - 1 - w // 2)), mode="wrap")
            v = sliding_window_view(pad, (w, w), axis=(1, 2))
            return (v * k).sum(axis=(-1, -2))

        d2 = psd_distance(smooth(truth, 2), truth)
        d4 = psd_distance(smooth(truth, 4), truth)
        assert 0 < d2 < d4

    def test_psd_distance_scorecard_integration(self):
        from diffusionmodelscustom_tpu.evaluation.parity import parity_scorecard

        rng = np.random.default_rng(2)
        truth = rng.normal(size=(6, 32, 32))
        card = parity_scorecard(truth + 0.1 * rng.normal(size=truth.shape),
                                truth)
        assert "psd_dist" in card and np.isfinite(card["psd_dist"])
