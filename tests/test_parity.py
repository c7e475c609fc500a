"""Parity-validation tests against the reference's shipped npz artifacts
(the only ground-truth outputs that exist; BASELINE.md)."""

import numpy as np
import pytest

from diffusionmodelscustom_tpu.evaluation.parity import (
    REFERENCE_SAMPLES_DIR,
    load_reference_bundles,
    parity_scorecard,
    reference_yardstick,
)

needs_artifacts = pytest.mark.skipif(
    not REFERENCE_SAMPLES_DIR.exists(),
    reason="reference final_generated_samples not mounted",
)


@needs_artifacts
def test_load_reference_bundles_structure():
    bundles = load_reference_bundles()
    # 5 trained variants + the TEST variant = 6 gen/eval pairs
    assert len(bundles) >= 5
    for variant, b in bundles.items():
        assert b["gen"].shape == (100, 64, 64), variant
        assert b["eval"].shape == (100, 64, 64), variant
        # the unconditional variant ships a pickled-None lsm too
        assert b["lsm"] is None or b["lsm"].shape == (100, 64, 64), variant
        # variants without an ERA5 cond image (unconditional,
        # lsm_topo_only) carry a pickled None; the rest ship real conds
        assert b["cond"] is None or b["cond"].shape == (100, 64, 64)
        if "ERA5" in variant or "uniform" in variant:
            assert b["cond"] is not None, variant


@needs_artifacts
def test_reference_yardstick_regime():
    cards = reference_yardstick()
    assert len(cards) >= 5
    for variant, c in cards.items():
        # truth fields are physical temperatures
        assert -40 < c["truth_mean"] < 40, variant
        assert np.isfinite(c["rmse"]) and c["rmse"] > 0, variant
        assert 0 <= c["ks"] <= 1


def test_parity_scorecard_perfect_match_is_zero_distance():
    rng = np.random.default_rng(0)
    truth = rng.normal(8.0, 5.0, (20, 16, 16))
    lsm = (rng.uniform(size=(20, 16, 16)) > 0.4).astype(np.float32)
    card = parity_scorecard(truth.copy(), truth, lsm)
    assert card["mae"] == 0.0
    assert card["wasserstein1"] < 1e-9
    assert card["ks"] < 1e-9
    assert card["frac_outside_truth_range"] == 0.0


def test_parity_scorecard_detects_miscalibration():
    rng = np.random.default_rng(1)
    truth = rng.normal(8.0, 5.0, (20, 16, 16))
    wild = rng.normal(8.0, 120.0, (20, 16, 16))  # reference-style blow-up
    card = parity_scorecard(wild, truth)
    assert card["wasserstein1"] > 50
    assert card["frac_outside_truth_range"] > 0.5
