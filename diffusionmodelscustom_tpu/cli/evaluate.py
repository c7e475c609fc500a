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
    report = {k: (round(v, 6) if isinstance(v, float) else v) for k, v in report.items()}
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
