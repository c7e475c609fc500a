"""Evaluation CLI — rebuild of ``evaluation_DANRA_conditional.py`` (C15).

Loads the generation npz bundles (gen/eval/lsm, the naming emitted by
cli/generate.py and by the reference at
generation_DANRA_conditional.py:431-441), masks ocean pixels via the lsm
(evaluation_DANRA_conditional.py:93-96), and prints the full scorecard:
daily + pixel MAE/RMSE, bias, pixel-distribution comparison, CRPS across
the sample ensemble, Moran's I, and optional threshold skill scores —
including the metrics the reference listed as TODO (:251-257).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate generated fields")
    p.add_argument("bundle_dir", type=str, help="directory with *_samples.npz")
    p.add_argument("--event_threshold", type=float, default=None,
                   help="exceedance threshold for Heidke/Peirce skill")
    p.add_argument("--bins", type=int, default=50)
    p.add_argument("--out", type=str, default=None, help="write JSON report here")
    p.add_argument(
        "--against_reference",
        action="store_true",
        help="also print the reference variants' gen-vs-truth scorecards "
             "(final_generated_samples yardstick) for side-by-side reading",
    )
    return p


def _load(path: Path):
    with np.load(path) as z:
        key = "data" if "data" in z.files else z.files[0]
        return np.asarray(z[key])


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    d = Path(args.bundle_dir)
    gen = _load(d / "gen_samples.npz").squeeze(-1) if (d / "gen_samples.npz").exists() else None
    ref = _load(d / "eval_samples.npz").squeeze(-1) if (d / "eval_samples.npz").exists() else None
    assert gen is not None and ref is not None, "need gen_samples.npz and eval_samples.npz"
    lsm = None
    if (d / "lsm_samples.npz").exists():
        lsm = _load(d / "lsm_samples.npz").squeeze(-1)

    from ..evaluation import (
        crps_ensemble,
        evaluate_fields,
        pixel_distribution,
    )

    report = evaluate_fields(gen, ref, lsm, event_threshold=args.event_threshold)
    # ensemble CRPS of generated members against the mean truth field —
    # the per-date ensemble protocol needs date-matched members; with one
    # member per date we report the sample-ensemble CRPS vs the truth mean
    report["crps_ensemble_vs_mean_truth"] = crps_ensemble(
        gen, ref.mean(axis=0), lsm[0] > 0.5 if lsm is not None else None
    )
    hist_gen, edges = pixel_distribution(gen, lsm > 0.5 if lsm is not None else None,
                                         bins=args.bins)
    hist_ref, _ = pixel_distribution(ref, lsm > 0.5 if lsm is not None else None,
                                     bins=args.bins, range_=(edges[0], edges[-1]))
    widths = np.diff(edges)
    report["distribution_overlap"] = float(
        np.sum(np.minimum(hist_gen, hist_ref) * widths)
    )
    # distribution distances + FID (the reference's TODO list, :251-257)
    from ..evaluation.fid import fid
    from ..evaluation.parity import parity_scorecard

    card = parity_scorecard(gen, ref, lsm)
    for key in ("wasserstein1", "ks", "crps", "frac_outside_truth_range"):
        report[key] = card[key]
    report["fid"] = fid(gen, ref)

    if args.against_reference:
        from ..evaluation.parity import REFERENCE_SAMPLES_DIR, reference_yardstick

        if REFERENCE_SAMPLES_DIR.exists():
            report["reference_yardstick"] = {
                variant: {k: round(float(v), 4) for k, v in c.items()}
                for variant, c in reference_yardstick().items()
            }

    report = {k: (round(v, 6) if isinstance(v, float) else v) for k, v in report.items()}
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
