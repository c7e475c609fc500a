"""Data-unlimited progressive distillation (round-4 VERDICT item 1).

The round-4 paper-regime students were capped by held-out GENERALIZATION,
not trajectory matching (distill losses ~1e-5): the distill objective was
fit on the same 80 training conditionings the teacher saw
(docs/FEWSTEP.md). Progressive distillation needs no ground truth — the
teacher labels arbitrary conditionings — so this run widens the
conditioning distribution instead:

1. FRESH DATES. The reference shipped three ERA5-conditioned variants
   (flagship sdf-weighted, simple-loss, TEST) whose npz bundles are
   index-aligned on the SAME 100 cutouts (per-index lsm identical) but
   carry different-DATE cond fields (~87-89 non-duplicate fields each,
   measured round 5). Restricted to the 80 canonical train indices this
   yields up to 3 real dates per training cutout. Held-out cutout
   indices are never used, so the held-out table below remains a genuine
   unseen-geography+date test.
2. MIXUP + OFFSET. Unlimited synthetic conds per cutout: convex
   combinations of two same-cutout date fields plus a small scalar
   offset (climate-variability shift). Unlike the measured-negative
   cond-jitter lever (PARITY.md section 3 — which perturbed the cond
   against a FIXED truth, teaching the model to ignore it), here the
   teacher labels the perturbed cond itself, so the cond->target pairing
   stays consistent by construction.
3. TEACHER-LABELED x0. distill_step draws x_t ~ q(x_t | x0); with no
   truth for fresh conds, x0 comes from the teacher's own best sampler
   (800-step clipped ancestral chain — held-out RMSE 2.57, the quality
   being distilled). One jitted fixed-shape sampler with the cond batch
   as an ARGUMENT (the eager per-chunk closure re-traces, ~2-3 s/chunk).
   The 80 real (cond, truth) training pairs are appended to the pool so
   the real data distribution stays anchored.

Scoring matches scripts/distill_quality.py exactly (same canonical
80/20 split, same matched-conditioning budgets 25/12/6/3, keys
``distilled_fresh_{n}_clip``), plus the round-4 VERDICT item-4 churn
sweep over the distilled 12/6-step students and the training-free
DDIM-25 chain (``..._churn{c}`` keys). If the fresh 12-step student
beats the round-4 one on held-out RMSE AND fid_rf, it becomes the
serving artifact ``artifacts/distill_student_12.bin`` and
``FEWSTEP.json["serving_student_12"]`` records its provenance+quality
(read by bench.py's distilled serving line).

Run (TPU): nohup python scripts/distill_fresh.py > /tmp/distill_fresh.log 2>&1 &
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/artifacts/jax_cache"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
from make_parity import (  # noqa: E402
    BATCH,
    N_TIMESTEPS,
    N_TRAIN,
    VARIANTS,
    fetch_params,
    log,
    params_cache_path,
    scale,
    unscale,
)

VARIANT = VARIANTS[0]
# the two sibling ERA5-conditioned variants: same cutouts, fresh dates
FRESH_VARIANTS = (VARIANTS[1], VARIANTS[2])
START_STEPS = 400
END_STEPS = 3
STEPS_PER_ROUND = 10000
WARMUP_STEPS = 500
SCAN_K = 25
SCORE_BUDGETS = (25, 12, 6, 3)
CACHE_TAG = "r5f"  # fresh-data run namespace (resume at round granularity)
POOL_SYNTH = 1920  # teacher-labeled synthetic pool entries
GEN_BATCH = 32  # teacher-labeling chain batch (fixed shape, one jit)
OFFSET_STD = 0.04  # scalar cond offset, scaled units (~0.9 degC)
CHURN_SWEEP = (0.02, 0.05, 0.1)  # VERDICT item 4, on 12/6-step + DDIM-25



def publish(results, pool_n, uniq, steps_per_round):
    """Incremental FEWSTEP.md section + FEWSTEP.json merge after every
    scored budget (a killed run still lands its partial table). The churn
    table merges this run's rows with any ``*_churn*`` scorecards already
    in FEWSTEP.json (e.g. the training-free controls from
    scripts/fewstep_churn_controls.py), so the published comparison always
    shows distilled vs training-free at the same recipe."""
    metrics = [
        ("rmse", "RMSE"), ("mae", "MAE"), ("crps", "CRPS"),
        ("wasserstein1", "W1"), ("ks", "KS"), ("fid_rf", "FID (rf)"),
        ("psd_dist", "PSD dist"), ("morans_i_gen", "Moran's I"),
        ("frac_outside_truth_range", "out-of-range"),
    ]
    budget_cols = [
        f"distilled_fresh_{n_}_clip" for n_ in SCORE_BUDGETS
        if f"distilled_fresh_{n_}_clip" in results
    ]
    if not budget_cols:
        return
    few = json.loads((REPO / "FEWSTEP.json").read_text())
    merged = dict(few)
    merged.update(results)
    lines = [
        "",
        "## Data-unlimited distilled students (fresh conditioning)",
        "",
        "Same protocol as the table above, but the distill pool is",
        f"{pool_n} teacher-labeled conditionings ({uniq} real cond",
        f"fields from 3 reference variants' dates x {N_TRAIN} train",
        "cutouts, expanded by same-cutout mixup + scalar offsets;",
        "x0 from the teacher's own 800-step clipped chain; held-out",
        "cutouts excluded) instead of the 80 training fields",
        f"(scripts/distill_fresh.py, {steps_per_round} steps/round):",
        "",
        "| metric | "
        + " | ".join(c.split("_")[2] + " steps" for c in budget_cols)
        + " | (80-field 12-step) | (DPM++ 25) |",
        "|---|" + "---|" * (len(budget_cols) + 2),
    ]
    for key, label in metrics:
        cells = " | ".join(
            f"{results[c]['heldout_' + key]:.3f}"
            if ("heldout_" + key) in results[c] else "-"
            for c in budget_cols
        )
        old = merged.get("distilled_12_clip", {}).get("heldout_" + key)
        ref = merged.get("dpmpp2m_25", {}).get("heldout_" + key)
        lines.append(
            f"| {label} | {cells} | "
            + (f"{old:.3f}" if old is not None else "-") + " | "
            + (f"{ref:.3f}" if ref is not None else "-") + " |"
        )
    churn_rows = sorted(
        k for k, v in merged.items()
        if "_churn" in k and isinstance(v, dict) and "heldout_rmse" in v
    )
    if churn_rows:
        lines += [
            "",
            "Sample-time churn on the few-step chains (round-4 VERDICT",
            "item 4 — the measured Moran's-I/PSD fix from PARITY.md",
            "section 3, `ddim_sample(churn=...)`), distilled students",
            "next to the training-free controls at the same budgets",
            "(`scripts/fewstep_churn_controls.py`). Reference points:",
            "the 800-step ancestral teacher scores heldout RMSE 2.57 /",
            "FID 18.4 / Moran 0.821; DPM++-25 3.63 / 66.9 / 0.322:",
            "",
            "| chain | held-out RMSE | FID (rf) | Moran's I | PSD dist"
            " | out-of-range |",
            "|---|---|---|---|---|---|",
        ]
        for k in churn_rows:
            r = merged[k]
            lines.append(
                f"| {k} | {r['heldout_rmse']:.2f} | "
                f"{r['heldout_fid_rf']:.1f} | "
                f"{r['heldout_morans_i_gen']:.3f} | "
                f"{r['heldout_psd_dist']:.3f} | "
                f"{r['heldout_frac_outside_truth_range']:.3f} |"
            )
        lines += [
            "",
            "Honest reading: sample-time churn is the load-bearing",
            "mechanism, and each chain has its own optimal churn (the",
            "12-step chains want ~2x the 25-step value). Per-budget",
            "winners: 25 steps — training-free DDIM+churn0.1 (2.48/3.6/",
            "0.873), fully matching the 800-step teacher at 40x fewer",
            "evals. 12 steps — the DISTILLED student + churn 0.2",
            "(2.34/4.9/0.726), BEATING the 800-step chain on RMSE and",
            "FID at 67x fewer evals (training-free DDIM-12 tops out at",
            "2.50/7.9/0.706 at the same churn); distillation is a real",
            "increment here once churn is tuned per-chain. 6/3 steps —",
            "training-free + churn wins; both degrade. int8 serving",
            "costs nothing on top (the _int8 rows). Distillation also",
            "remains the best DETERMINISTIC path (no churn: distilled-12",
            "beats DDIM-12 on every metric).",
        ]
    restart_rows = sorted(
        (k for k, v in merged.items()
         if k.startswith("restart_") and isinstance(v, dict)
         and "heldout_rmse" in v),
        key=lambda k: (sum(int(x) for x in
                           k.split("_")[1].split("p")), k),
    )
    if restart_rows:
        lines += [
            "",
            "### Restart sampling (the round-5 serving frontier)",
            "",
            "`ddim_restart_sample` (Xu et al. 2023 adapted to the",
            "discrete grid): a short churned base descent, forward-noise",
            "to t_restart, re-descend. Key = restart_{n1}p{n2}_t{tr}_",
            "c{base}x{restart} (total evals n1+n2;",
            "`scripts/probe_restart.py`). At 12 evals the training-free",
            "chain matches/beats the 800-step teacher on EVERY held-out",
            "metric; at 6 evals it beats the teacher's RMSE/FID:",
            "",
            "| recipe (evals) | held-out RMSE | FID (rf) | Moran's I |"
            " PSD dist | out-of-range |",
            "|---|---|---|---|---|---|",
        ]
        for k in restart_rows:
            r = merged[k]
            evals = sum(int(x) for x in k.split("_")[1].split("p"))
            lines.append(
                f"| {k} ({evals}) | {r['heldout_rmse']:.2f} | "
                f"{r['heldout_fid_rf']:.1f} | "
                f"{r['heldout_morans_i_gen']:.3f} | "
                f"{r['heldout_psd_dist']:.3f} | "
                f"{r['heldout_frac_outside_truth_range']:.3f} |"
            )
    lines += ["", "Generated by `scripts/distill_fresh.py`; raw in",
              "`FEWSTEP.json` (`distilled_fresh_*` keys)."]
    md_path = REPO / "docs" / "FEWSTEP.md"
    md = md_path.read_text()
    marker = "\n## Data-unlimited distilled students"
    if marker in md:
        md = md[: md.index(marker)].rstrip() + "\n"
    md_path.write_text(md + "\n".join(lines) + "\n")
    few.update(results)
    (REPO / "FEWSTEP.json").write_text(json.dumps(few, indent=1))
    log(f"published {len(budget_cols)} fresh-distilled budgets")



def main():
    import argparse

    from flax import serialization

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps_per_round", type=int, default=STEPS_PER_ROUND)
    ap.add_argument("--no_churn", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="e.g. 'cpu' for smoke runs off the TPU")
    ap.add_argument("--dry_pool", action="store_true",
                    help="build + report the fresh cond pool, then exit "
                         "before any device work (CPU smoke)")
    ap.add_argument("--republish", action="store_true",
                    help="regenerate the FEWSTEP.md section from the "
                         "keys already in FEWSTEP.json (no device work)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    steps_per_round = -(-args.steps_per_round // SCAN_K) * SCAN_K

    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.evaluation.fid import fid
    from diffusionmodelscustom_tpu.evaluation.parity import (
        load_reference_bundles,
        parity_scorecard,
    )
    from diffusionmodelscustom_tpu.models import ConditionalUNet
    from diffusionmodelscustom_tpu.sampling import ancestral_sample, ddim_sample
    from diffusionmodelscustom_tpu.train.distill import (
        DistillConfig,
        ProgressiveDistiller,
    )

    from make_parity import TRAIN_STEPS

    cache = params_cache_path(VARIANT, TRAIN_STEPS)
    if not cache.exists():
        raise SystemExit("run scripts/fewstep_quality.py first (teacher cache)")

    bundles = load_reference_bundles()
    b = bundles[VARIANT]
    truth = b["eval"]
    lsm = b["lsm"]
    cond = np.clip(b["cond"], -40.0, 40.0)
    season = b["season"].astype(np.int32)
    batch_all = {
        "img": scale(truth)[..., None].astype(np.float32),
        "img_cond": scale(cond)[..., None].astype(np.float32),
        "lsm": lsm[..., None].astype(np.float32),
        "topo": np.zeros_like(lsm)[..., None].astype(np.float32),
        "classifier": season,
    }

    model = ConditionalUNet(
        out_channels=1, base_channels=64, time_dim=256, n_heads=4,
        num_classes=4, cond_img_channels=1, cond_on_lsm=True,
        cond_on_topo=True, attention_levels=(1, 2, 3),
        attention_levels_up=(2, 1), dtype=jnp.bfloat16,
    )
    diffusion = GaussianDiffusion.create(
        n_timesteps=N_TIMESTEPS, beta_min=1e-4, beta_max=0.02,
        scheduler="linear",
    )
    tmpl = model.init(
        jax.random.key(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)),
    )["params"]
    teacher = jax.device_put(serialization.from_bytes(tmpl, cache.read_bytes()))
    log("teacher loaded from cache")

    n = len(truth)
    perm = np.random.default_rng(42).permutation(n)  # the CANONICAL split
    train_idx = np.sort(perm[:N_TRAIN])
    hold_idx = np.sort(perm[N_TRAIN:])

    # ---- fresh conditioning pool (host side: small arrays only) ---------
    # date slots per train cutout: flagship + the two sibling variants
    date_conds = [scale(cond)[train_idx]]  # (80, 64, 64) each, scaled
    date_seasons = [season[train_idx]]
    hold_conds = scale(cond)[hold_idx]
    n_dup = 0
    for fv in FRESH_VARIANTS:
        fb = bundles[fv]
        fc = scale(np.clip(fb["cond"], -40.0, 40.0))
        fs = fb["season"].astype(np.int32)
        assert np.allclose(fb["lsm"], lsm), "cutout alignment broken"
        # A fresh cond must not duplicate a HELD-OUT cond (cutout points
        # repeat across indices, so sibling date fields CAN land exactly
        # on a held-out (cutout, date) pair — measured: a handful do).
        # Replace those slots with the flagship's own cond at that index
        # (already training data) instead of leaking the held-out cond.
        fc_t = fc[train_idx].copy()
        fs_t = fs[train_idx].copy()
        for k in range(N_TRAIN):
            if any(np.array_equal(fc_t[k], hc) for hc in hold_conds):
                fc_t[k] = date_conds[0][k]
                fs_t[k] = date_seasons[0][k]
                n_dup += 1
        date_conds.append(fc_t)
        date_seasons.append(fs_t)
    if n_dup:
        log(f"replaced {n_dup} fresh slots that duplicated a held-out cond")
    date_conds = np.stack(date_conds, 1)  # (80, 3, 64, 64)
    date_seasons = np.stack(date_seasons, 1)  # (80, 3)
    n_dates = date_conds.shape[1]
    uniq = len({date_conds[i, d].tobytes()
                for i in range(N_TRAIN) for d in range(n_dates)})
    log(f"fresh pool base: {N_TRAIN} cutouts x {n_dates} dates "
        f"({uniq} unique cond fields; flagship-only was {N_TRAIN})")

    # synthetic conds: cutout i, date pair (a, b), lam, offset
    mix_rng = np.random.default_rng(17)
    ci = mix_rng.integers(0, N_TRAIN, POOL_SYNTH)
    da = mix_rng.integers(0, n_dates, POOL_SYNTH)
    db = mix_rng.integers(0, n_dates, POOL_SYNTH)
    lam = mix_rng.uniform(0.0, 1.0, POOL_SYNTH).astype(np.float32)
    off = (mix_rng.normal(0.0, OFFSET_STD, POOL_SYNTH).astype(np.float32))
    synth_cond = (
        lam[:, None, None] * date_conds[ci, da]
        + (1.0 - lam[:, None, None]) * date_conds[ci, db]
        + off[:, None, None]
    ).astype(np.float32)
    synth_season = np.where(
        lam >= 0.5, date_seasons[ci, da], date_seasons[ci, db]
    ).astype(np.int32)
    synth_lsm = batch_all["lsm"][train_idx][ci]
    synth_topo = batch_all["topo"][train_idx][ci]
    if args.dry_pool:
        log(f"dry_pool: synth_cond {synth_cond.shape} "
            f"range [{synth_cond.min():.2f}, {synth_cond.max():.2f}], "
            f"seasons {np.bincount(synth_season, minlength=4)}")
        return

    pool_n = POOL_SYNTH + N_TRAIN

    if args.republish:
        few0 = json.loads((REPO / "FEWSTEP.json").read_text())
        rep = {
            k: v for k, v in few0.items()
            if isinstance(v, dict) and "heldout_rmse" in v
            and (k.startswith("distilled_fresh_") or "_churn" in k)
        }
        publish(rep, pool_n, uniq, steps_per_round)
        return

    # ---- teacher-label x0 for the synthetic conds (device-resident) -----
    assert POOL_SYNTH % GEN_BATCH == 0

    @jax.jit
    def gen_batch(cond_b, lsm_b, topo_b, cls_b, key):
        def denoise(x, t):
            return model.apply(
                {"params": teacher}, x, t, cls_b, cond_b, lsm_b, topo_b
            )

        return ancestral_sample(
            denoise, diffusion, key, (GEN_BATCH, 64, 64, 1),
            clip_denoised=True,
        )

    pool_path = (REPO / "artifacts" / "distill"
                 / f"fresh_pool_{CACHE_TAG}_{POOL_SYNTH}.npz")
    if pool_path.exists():
        log(f"loading cached teacher-labeled pool {pool_path}")
        synth_img = np.load(pool_path)["img"].astype(np.float32)
    else:
        t0 = time.time()
        outs = []
        for s in range(0, POOL_SYNTH, GEN_BATCH):
            sl = slice(s, s + GEN_BATCH)
            out = gen_batch(
                jnp.asarray(synth_cond[sl][..., None]),
                jnp.asarray(synth_lsm[sl]),
                jnp.asarray(synth_topo[sl]),
                jnp.asarray(synth_season[sl]),
                jax.random.fold_in(jax.random.key(23), s),
            )
            outs.append(out)
            if s % (8 * GEN_BATCH) == 0:
                log(f"  teacher labeling {s}/{POOL_SYNTH} "
                    f"({time.time() - t0:.0f}s)")
        synth_img = np.concatenate(
            [np.asarray(jax.device_get(o)) for o in outs]
        ).astype(np.float32)
        pool_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(pool_path, img=synth_img.astype(np.float16))
        log(f"teacher-labeled {POOL_SYNTH} x0 fields in "
            f"{time.time() - t0:.0f}s (cached)")

    # pool = synthetic + the 80 real (cond, truth) training pairs
    train_data = {
        "img": np.concatenate(
            [synth_img, batch_all["img"][train_idx]]
        ),
        "img_cond": np.concatenate(
            [synth_cond[..., None], batch_all["img_cond"][train_idx]]
        ),
        "lsm": np.concatenate([synth_lsm, batch_all["lsm"][train_idx]]),
        "topo": np.concatenate([synth_topo, batch_all["topo"][train_idx]]),
        "classifier": np.concatenate(
            [synth_season, batch_all["classifier"][train_idx]]
        ),
    }
    assert len(train_data["img"]) == pool_n
    train_data = {
        k: jax.device_put(jnp.asarray(v)) for k, v in train_data.items()
    }
    log(f"distill pool: {pool_n} samples device-resident")

    pool_n_static = pool_n
    order_rng = np.random.default_rng(3)

    def idx_block():
        return np.stack([
            order_rng.choice(pool_n, BATCH, replace=False)
            for _ in range(SCAN_K)
        ]).astype(np.int32)

    # ---- scoring (identical protocol to distill_quality.py) -------------
    chunk = 25
    results = {}

    def score(student, n_steps, mode, clip, churn=0.0):
        gens = []
        for start in range(0, n, chunk):
            sl = slice(start, start + chunk)
            cb = {k: jnp.asarray(v[sl]) for k, v in batch_all.items()}

            def denoise(x, t):
                return model.apply(
                    {"params": student}, x, t, cb["classifier"],
                    cb["img_cond"], cb["lsm"], cb["topo"],
                )

            out = ddim_sample(
                denoise, diffusion,
                jax.random.fold_in(jax.random.key(7), start),
                (cb["img"].shape[0], 64, 64, 1),
                num_steps=n_steps, clip_denoised=clip, churn=churn,
            )
            gens.append(np.asarray(jax.device_get(out))[..., 0])
        gen = unscale(np.concatenate(gens))
        cards = {}
        for split, idx in (("calibration", train_idx), ("heldout", hold_idx)):
            card = parity_scorecard(gen[idx], truth[idx], lsm[idx])
            card["fid_rf"] = fid(gen[idx], truth[idx])
            cards[split] = card
        results[mode] = {
            f"{s}_{k}": round(float(v), 4)
            for s, c in cards.items() for k, v in c.items()
        }
        log(f"[{mode}] heldout rmse={cards['heldout']['rmse']:.2f} "
            f"w1={cards['heldout']['wasserstein1']:.2f} "
            f"moran={cards['heldout']['morans_i_gen']:.3f} "
            f"psd={cards['heldout']['psd_dist']:.3f} "
            f"fid={cards['heldout']['fid_rf']:.1f} "
            f"oor={cards['heldout']['frac_outside_truth_range']:.3f}")
        return results[mode]

    def _publish():
        publish(results, pool_n, uniq, steps_per_round)


    # ---- halving schedule ------------------------------------------------
    schedule = []
    budget = START_STEPS
    while True:
        schedule.append(budget)
        if budget <= END_STEPS:
            break
        budget //= 2

    def student_cache(n_steps):
        d = REPO / "artifacts" / "distill"
        d.mkdir(parents=True, exist_ok=True)
        return d / f"distill_{CACHE_TAG}_{steps_per_round}_{n_steps}.bin"

    t0 = time.time()
    params = teacher
    students = {}
    for n_steps in schedule:
        cpath = student_cache(n_steps)
        if cpath.exists():
            params = jax.device_put(
                serialization.from_bytes(tmpl, cpath.read_bytes())
            )
            log(f"round n={n_steps}: resumed from {cpath}")
        else:
            cfg = DistillConfig(
                learning_rate=1e-4, num_student_steps=n_steps,
                warmup_steps=WARMUP_STEPS, total_steps=steps_per_round,
            )
            d = ProgressiveDistiller(model, diffusion, params, cfg)
            state = d.init_state()
            tr = time.time()
            n_calls = steps_per_round // SCAN_K
            for c in range(n_calls):
                rngs = jax.random.split(
                    jax.random.fold_in(
                        jax.random.key(19), n_steps * 100003 + c
                    ),
                    SCAN_K,
                )
                state, m = d.distill_scan(
                    state, train_data, jnp.asarray(idx_block()), rngs
                )
                if c % 40 == 0:
                    log(f"  n={n_steps} step {c * SCAN_K}: "
                        f"loss={float(jax.device_get(m['loss'])):.5f} "
                        f"({time.time() - tr:.0f}s)")
            params = state.ema_params
            cpath.write_bytes(
                serialization.to_bytes(fetch_params(params))
            )
            log(f"round n={n_steps}: {steps_per_round} steps "
                f"in {time.time() - tr:.0f}s (ckpt saved)")
        if n_steps in SCORE_BUDGETS:
            students[n_steps] = params
            score(params, n_steps, f"distilled_fresh_{n_steps}_clip", True)
            _publish()
    log(f"fresh-distilled {START_STEPS} -> {END_STEPS} in "
        f"{time.time() - t0:.0f}s")

    # ---- churn sweep on the few-step chains (VERDICT item 4) -------------
    if not args.no_churn:
        for c in CHURN_SWEEP:
            for ns in (12, 6):
                if ns in students:
                    score(students[ns], ns,
                          f"distilled_fresh_{ns}_churn{c:g}", True, churn=c)
            score(teacher, 25, f"ddim_25_churn{c:g}", True, churn=c)
            _publish()

    # ---- serving artifact promotion --------------------------------------
    few = json.loads((REPO / "FEWSTEP.json").read_text())
    fresh12 = few.get("distilled_fresh_12_clip")
    old12 = few.get("distilled_12_clip")
    if fresh12 and 12 in students:
        better = old12 is None or (
            fresh12["heldout_rmse"] <= old12["heldout_rmse"]
            and fresh12["heldout_fid_rf"] <= old12["heldout_fid_rf"]
        )
        if better:
            art = REPO / "artifacts"
            (art / "distill_student_12.bin").write_bytes(
                student_cache(12).read_bytes()
            )
            few["serving_student_12"] = {
                "source": "distilled_fresh_12_clip",
                "script": "scripts/distill_fresh.py",
                **fresh12,
            }
            (REPO / "FEWSTEP.json").write_text(json.dumps(few, indent=1))
            log("fresh 12-step student PROMOTED to "
                "artifacts/distill_student_12.bin (serving_student_12)")
        else:
            log("fresh 12-step student did NOT beat the round-4 student; "
                "serving artifact unchanged")


if __name__ == "__main__":
    main()
