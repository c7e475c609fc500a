"""Date-matched ERA5/DANRA evaluation-set construction.

Rebuild of the eval-set preparation step in the reference's generation
workflow (DDPM_DANRA_conditional/generation_DANRA_conditional.py:45-175):

1. list the daily files of both archives, parsing the date stamped in
   each filename (DANRA ``t2m_ave_YYYYMMDD.nc``, ERA5
   ``temp_589x789_YYYYMMDD.npz``);
2. keep only files inside ``[year_start, year_end]``;
3. drop dates present in only one archive (the reference prints and
   removes the asymmetric difference, :66-88);
4. draw ``n_samples`` random dates without replacement from the matched
   set with a fixed numpy seed (:95-110), falling back to "all of them"
   when fewer are available (:100-104);
5. copy the selected pairs into eval directories (emptying any previous
   contents, :152-170) and convert each side to a chunked store
   (daily_files_to_zarr conversion, :173+);
6. report the per-season counts of the chosen dates (:130-147).

The date is recognized as the trailing ``YYYYMMDD`` group in the stem, so
the builder works for any variable naming that follows the reference's
``*_YYYYMMDD.<ext>`` convention.
"""

from __future__ import annotations

import os
import re
import shutil
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .store import convert_nc_to_store, convert_npz_to_store

_DATE_RE = re.compile(r"(\d{8})(?=\.[A-Za-z0-9]+$)")

# the reference's season buckets (generation_DANRA_conditional.py:131-135)
_SEASONS = {
    "winter": ("12", "01", "02"),
    "spring": ("03", "04", "05"),
    "summer": ("06", "07", "08"),
    "autumn": ("09", "10", "11"),
}


def parse_file_date(filename: str) -> Optional[int]:
    """Trailing YYYYMMDD in the stem, or None (generalizes the
    reference's fixed slice offsets ``[-12:-4]``/``[-11:-3]``)."""
    m = _DATE_RE.search(os.path.basename(filename))
    return int(m.group(1)) if m else None


def list_dated_files(
    directory: os.PathLike, year_start: int, year_end: int
) -> Dict[int, str]:
    """date -> filename for every parseable file inside the year window
    (skips undated files the way the reference skips ``.DS_Store``)."""
    out: Dict[int, str] = {}
    for fname in sorted(os.listdir(directory)):
        date = parse_file_date(fname)
        if date is None:
            continue
        if year_start <= date // 10000 <= year_end:
            out[date] = fname
    return out


def match_dates(
    era5: Dict[int, str], danra: Dict[int, str]
) -> Tuple[List[int], List[int], List[int]]:
    """(matched, era5_only, danra_only) sorted date lists
    (generation_DANRA_conditional.py:66-88)."""
    matched = sorted(set(era5) & set(danra))
    return (
        matched,
        sorted(set(era5) - set(danra)),
        sorted(set(danra) - set(era5)),
    )


def season_counts(dates: Sequence[int]) -> Dict[str, int]:
    """Per-season tally of YYYYMMDD dates (:130-147)."""
    counts = {name: 0 for name in _SEASONS}
    for date in dates:
        month = f"{(date // 100) % 100:02d}"
        for name, months in _SEASONS.items():
            if month in months:
                counts[name] += 1
    return counts


def build_matched_eval_set(
    era5_dir: os.PathLike,
    danra_dir: os.PathLike,
    out_dir: os.PathLike,
    *,
    n_samples: int = 100,
    year_start: int = 2001,
    year_end: int = 2005,
    seed: int = 42,
    make_stores: bool = True,
) -> Dict[str, object]:
    """End-to-end eval-set build: match -> sample -> copy -> store.

    Writes ``<out_dir>/era5_eval`` + ``<out_dir>/danra_eval`` file
    directories and (when ``make_stores``) ``era5_eval_store`` /
    ``danra_eval_store`` chunked stores. Returns a summary dict with the
    selected dates, per-season counts, and the unmatched dates that were
    dropped.
    """
    era5_files = list_dated_files(era5_dir, year_start, year_end)
    danra_files = list_dated_files(danra_dir, year_start, year_end)
    matched, era5_only, danra_only = match_dates(era5_files, danra_files)
    if not matched:
        raise ValueError(
            f"no date-matched pairs between {era5_dir} and {danra_dir} "
            f"in {year_start}-{year_end}"
        )

    # reference fallback: not enough files -> use all of them (:100-104)
    n = min(n_samples, len(matched))
    rng = np.random.RandomState(seed)  # reference uses np.random.seed(42)
    dates = np.sort(rng.choice(np.asarray(matched), size=n, replace=False))

    out_dir = Path(out_dir)
    eval_dirs = {
        "era5": out_dir / "era5_eval",
        "danra": out_dir / "danra_eval",
    }
    # empty pre-existing eval dirs, as the reference does (:152-170)
    for d in eval_dirs.values():
        if d.exists():
            shutil.rmtree(d)
        d.mkdir(parents=True)
    for date in dates:
        date = int(date)
        shutil.copy2(
            Path(era5_dir) / era5_files[date], eval_dirs["era5"]
        )
        shutil.copy2(
            Path(danra_dir) / danra_files[date], eval_dirs["danra"]
        )

    stores = {}
    if make_stores:
        for side, d in eval_dirs.items():
            store_path = out_dir / f"{side}_eval_store"
            exts = {Path(f).suffix for f in os.listdir(d)}
            if ".npz" in exts:
                convert_npz_to_store(d, store_path)
            if ".nc" in exts:
                convert_nc_to_store(d, store_path)
            stores[side] = str(store_path)

    return {
        "dates": [int(x) for x in dates],
        "n_matched": len(matched),
        "dropped_era5_only": era5_only,
        "dropped_danra_only": danra_only,
        "season_counts": season_counts([int(x) for x in dates]),
        "eval_dirs": {k: str(v) for k, v in eval_dirs.items()},
        "stores": stores,
    }


def main(argv: Optional[Sequence[str]] = None) -> None:
    """CLI: python -m diffusionmodelscustom_tpu.data.evalset ..."""
    import argparse
    import json

    p = argparse.ArgumentParser(
        description="Build a date-matched ERA5/DANRA eval set "
        "(generation_DANRA_conditional.py:45-175)"
    )
    p.add_argument("era5_dir")
    p.add_argument("danra_dir")
    p.add_argument("out_dir")
    p.add_argument("--n-samples", type=int, default=100)
    p.add_argument("--year-start", type=int, default=2001)
    p.add_argument("--year-end", type=int, default=2005)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-stores", action="store_true")
    args = p.parse_args(argv)
    summary = build_matched_eval_set(
        args.era5_dir,
        args.danra_dir,
        args.out_dir,
        n_samples=args.n_samples,
        year_start=args.year_start,
        year_end=args.year_end,
        seed=args.seed,
        make_stores=not args.no_stores,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()


__all__ = [
    "parse_file_date",
    "list_dated_files",
    "match_dates",
    "season_counts",
    "build_matched_eval_set",
]
