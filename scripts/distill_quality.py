"""Distilled few-step quality: the matched-quality serving path below
~50 steps (follow-up to scripts/fewstep_quality.py, which measured the
training-free fast samplers losing spatial structure at 25-50 steps).

Loads the fewstep teacher (cached at /tmp/fewstep_params.bin by
fewstep_quality.py — run that first), progressively distills 400 -> 3
DDIM steps on the 80 train fields' conditioning (Salimans & Ho halving
schedule, train/distill.py), and scores the student at every serving
budget on the way down (25/12/6/3 steps): samples the same 100 matched-
conditioning fields, scores calibration/held-out against the truth —
appended to docs/FEWSTEP.md next to the training-free 25-step row.

Run (TPU, after fewstep_quality.py):  python scripts/distill_quality.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(  # committed cache: .jax_cache is gitignored and /tmp wiped per round
    "jax_compilation_cache_dir", "/root/repo/artifacts/jax_cache"
)

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
from make_parity import (  # noqa: E402
    BATCH,
    fetch_params,
    N_TIMESTEPS,
    N_TRAIN,
    VARIANTS,
    log,
    scale,
    unscale,
)

VARIANT = VARIANTS[0]
START_STEPS = 400  # first student budget; halves each round -> 3
END_STEPS = 3
# Paper regime (Salimans & Ho use ~10k updates per halving round on full
# datasets; round-3's 1500-step budget left the student behind the
# training-free DPM++ 25 — round-3 VERDICT item 1). Override with
# --steps_per_round for smoke runs.
STEPS_PER_ROUND = 10000
WARMUP_STEPS = 500
SCAN_K = 25  # updates per jitted distill_scan call
SCORE_BUDGETS = (25, 12, 6, 3)  # sample + score the student here
CACHE_TAG = "r4p"  # per-round student cache namespace (resume support)


def main():
    import argparse

    from flax import serialization

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps_per_round", type=int, default=STEPS_PER_ROUND)
    args = ap.parse_args()
    # distill_scan runs SCAN_K updates per jitted call, so the trained
    # step count is always a SCAN_K multiple — round the request UP front
    # so the warmup-cosine total_steps, the actual update count, and the
    # student cache tag all agree (round-4 ADVICE item 3)
    steps_per_round = -(-args.steps_per_round // SCAN_K) * SCAN_K
    if steps_per_round != args.steps_per_round:
        log(f"steps_per_round rounded {args.steps_per_round} -> "
            f"{steps_per_round} (SCAN_K={SCAN_K} multiple)")

    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.data.geo import generate_sdf, normalize_sdf
    from diffusionmodelscustom_tpu.evaluation.fid import fid
    from diffusionmodelscustom_tpu.evaluation.parity import (
        load_reference_bundles,
        parity_scorecard,
    )
    from diffusionmodelscustom_tpu.models import ConditionalUNet
    from diffusionmodelscustom_tpu.sampling import ddim_sample
    from diffusionmodelscustom_tpu.train.distill import (
        DistillConfig,
        ProgressiveDistiller,
    )

    from make_parity import TRAIN_STEPS, params_cache_path

    cache = pathlib.Path("/tmp/fewstep_params.bin")
    if not cache.exists():
        cache = params_cache_path(VARIANT, TRAIN_STEPS)
    if not cache.exists():
        # legacy cache name from before variant_slug disambiguation
        # (a make_parity run launched with the old naming writes here)
        cache = pathlib.Path(
            f"/tmp/parity_params_{VARIANT.split('__')[0]}_{TRAIN_STEPS}.bin"
        )
    if not cache.exists():
        raise SystemExit("run scripts/fewstep_quality.py first (teacher cache)")

    bundles = load_reference_bundles()
    b = bundles[VARIANT]
    truth = b["eval"]
    lsm = b["lsm"]
    cond = np.clip(b["cond"], -40.0, 40.0)
    season = b["season"].astype(np.int32)
    sdf = np.stack([normalize_sdf(generate_sdf(m)) for m in (lsm > 0.5)])
    batch_all = {
        "img": scale(truth)[..., None].astype(np.float32),
        "img_cond": scale(cond)[..., None].astype(np.float32),
        "lsm": lsm[..., None].astype(np.float32),
        "topo": np.zeros_like(lsm)[..., None].astype(np.float32),
        "classifier": season,
        "sdf": sdf[..., None].astype(np.float32),
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
    # template for deserialization
    tmpl = model.init(
        jax.random.key(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)),
    )["params"]
    teacher = serialization.from_bytes(tmpl, cache.read_bytes())
    log("teacher loaded from cache")

    n = len(truth)
    perm = np.random.default_rng(42).permutation(n)
    train_idx = np.sort(perm[:N_TRAIN])
    hold_idx = np.sort(perm[N_TRAIN:])
    order_rng = np.random.default_rng(3)

    # Device-resident train fields (~5 MB, uploaded ONCE): each scanned
    # step gathers its batch on-device from these by index — a single
    # distill_step would otherwise upload ~1.6 MB of conditioning per
    # update over the ~45 MB/s tunnel (the measured bottleneck at this
    # batch/size; see ProgressiveDistiller.distill_scan).
    train_data = {
        k: jax.device_put(jnp.asarray(v[train_idx]))
        for k, v in batch_all.items()
    }

    def idx_block():
        return np.stack([
            order_rng.choice(len(train_idx), BATCH, replace=False)
            for _ in range(SCAN_K)
        ]).astype(np.int32)

    chunk = 25
    results = {}

    def score(student, n_steps, mode, clip):
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
                num_steps=n_steps, clip_denoised=clip,
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
            f"fid={cards['heldout']['fid_rf']:.1f} "
            f"oor={cards['heldout']['frac_outside_truth_range']:.3f}")

    # Halving rounds, scoring the student at each serving budget on the
    # way down (the round-n student is the n-step sampler). Every round's
    # student is cached so a killed run resumes at round granularity.
    schedule = []
    budget = START_STEPS
    while True:
        schedule.append(budget)
        if budget <= END_STEPS:
            break
        budget //= 2

    def student_cache(n_steps):
        # in-repo (NOT /tmp): per-round students survive the /tmp wipe at
        # round transitions, so a killed paper-regime run resumes at
        # halving-round granularity next round
        d = REPO / "artifacts" / "distill"
        d.mkdir(parents=True, exist_ok=True)
        return d / f"distill_{CACHE_TAG}_{steps_per_round}_{n_steps}.bin"

    def publish():
        # Incremental: rewrite the distilled section of docs/FEWSTEP.md +
        # FEWSTEP.json after EVERY scored budget, so a run killed at the
        # round boundary still publishes the budgets it reached.
        metrics = [
            ("rmse", "RMSE"), ("mae", "MAE"), ("crps", "CRPS"),
            ("wasserstein1", "W1"), ("ks", "KS"), ("fid_rf", "FID (rf)"),
            ("psd_dist", "PSD dist"),
            ("morans_i_gen", "Moran's I"),
            ("frac_outside_truth_range", "out-of-range"),
        ]
        budget_cols = [
            f"distilled_{b}_clip" for b in SCORE_BUDGETS
            if f"distilled_{b}_clip" in results
        ]
        if not budget_cols:
            return
        few = json.loads((REPO / "FEWSTEP.json").read_text())
        lines = [
            "",
            "## Distilled students (same held-out fields)",
            "",
            f"Progressive distillation ({START_STEPS} -> {END_STEPS} DDIM",
            f"steps, {steps_per_round} steps/round — the paper's update",
            "regime — teacher = the model above), student scored at each",
            "serving budget on the way down",
            "(all with clip_denoised, like the training-free rows):",
            "",
            "| metric | "
            + " | ".join(c.split("_")[1] + " steps" for c in budget_cols)
            + " | (training-free DPM++ 25) |",
            "|---|" + "---|" * (len(budget_cols) + 1),
        ]
        for key, label in metrics:
            cells = " | ".join(
                f"{results[c]['heldout_' + key]:.3f}"
                if ("heldout_" + key) in results[c] else "-"
                for c in budget_cols
            )
            ref = few["dpmpp2m_25"].get("heldout_" + key)
            lines.append(
                f"| {label} | {cells} "
                f"| {ref:.3f} |" if ref is not None
                else f"| {label} | {cells} | - |"
            )
        # Context paragraphs are GENERATED from FEWSTEP.json keys (not
        # hand-written inside the replaced section, which a rerun would
        # silently delete — round-4 ADVICE item 1).
        merged = dict(few)
        merged.update(results)
        d12 = merged.get("distilled_12_clip")
        c12 = merged.get("ddim_12")
        p12 = merged.get("dpmpp2m_12")
        if d12 and c12 and p12:
            lines += [
                "",
                "Same-budget training-free controls at 12 steps (same",
                "teacher, same held-out fields —",
                "`scripts/fewstep_controls12.py`, raw in `FEWSTEP.json`):",
                f"DDIM-12 RMSE {c12['heldout_rmse']:.2f} / FID-rf "
                f"{c12['heldout_fid_rf']:.1f} / W1 "
                f"{c12['heldout_wasserstein1']:.2f}; DPM-Solver++-2M-12 "
                f"RMSE {p12['heldout_rmse']:.2f} / FID-rf "
                f"{p12['heldout_fid_rf']:.1f} (the multistep solver",
                "collapses below ~25 steps). The distilled 12-step student",
                f"({d12['heldout_rmse']:.2f} / {d12['heldout_fid_rf']:.0f} /"
                f" {d12['heldout_wasserstein1']:.2f}) is the <=12-step",
                "serving recipe where no training-free sampler holds up.",
            ]
        dpm25 = merged.get("dpmpp2m_25")
        if d12 and dpm25:
            lines += [
                "",
                "Standing: training-free DPM++ 25 (RMSE "
                f"{dpm25['heldout_rmse']:.2f} / FID-rf "
                f"{dpm25['heldout_fid_rf']:.0f}) vs the distilled 12-step",
                f"student (RMSE {d12['heldout_rmse']:.2f} / FID-rf "
                f"{d12['heldout_fid_rf']:.0f}) — distillation owns the",
                "<=12-step regime; the residual gap to the teacher is",
                "held-out generalization of the distill objective, not",
                "trajectory matching (losses ~1e-5).",
            ]
        lines += ["", "Generated by `scripts/distill_quality.py`; raw in",
                  "`FEWSTEP.json` (distilled keys, incl. an unclipped",
                  "distilled_25)."]
        md_path = REPO / "docs" / "FEWSTEP.md"
        md = md_path.read_text()
        marker = "\n## Distilled students"
        if marker in md:  # replace, never duplicate, a prior section
            md = md[: md.index(marker)].rstrip() + "\n"
        md_path.write_text(md + "\n".join(lines) + "\n")
        few.update(results)
        (REPO / "FEWSTEP.json").write_text(json.dumps(few, indent=1))
        log(f"published {len(budget_cols)} distilled budgets")

    t0 = time.time()
    params = teacher
    for n_steps in schedule:
        cpath = student_cache(n_steps)
        if cpath.exists():
            # device_put once: host leaves would re-upload ~62 MB per
            # scoring chunk / distiller init over the tunnel
            params = jax.device_put(
                serialization.from_bytes(tmpl, cpath.read_bytes())
            )
            log(f"round n={n_steps}: resumed from {cpath}")
        else:
            # warmup-cosine per round + unweighted eps loss: the measured
            # non-corrupting recipe (scripts/probe_distill_r3.py;
            # FEWSTEP.json['distill_probe'])
            cfg = DistillConfig(
                learning_rate=1e-4, num_student_steps=n_steps,
                warmup_steps=WARMUP_STEPS, total_steps=steps_per_round,
            )
            d = ProgressiveDistiller(model, diffusion, params, cfg)
            state = d.init_state()
            tr = time.time()
            n_calls = (steps_per_round + SCAN_K - 1) // SCAN_K
            for c in range(n_calls):
                rngs = jax.random.split(
                    jax.random.fold_in(
                        jax.random.key(11), n_steps * 100003 + c
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
            host_params = fetch_params(params)
            cpath.write_bytes(serialization.to_bytes(host_params))
            log(f"round n={n_steps}: {n_calls * SCAN_K} steps "
                f"in {time.time() - tr:.0f}s (ckpt saved)")
        if n_steps in SCORE_BUDGETS:
            score(params, n_steps, f"distilled_{n_steps}_clip", True)
            publish()  # before the optional unclipped run: land the row
            if n_steps == 25:
                score(params, n_steps, "distilled_25", False)
                publish()
        if n_steps == 12:
            # the 12-step serving student: persisted in-repo so
            # bench.py danra128serve --params_file can time the REAL
            # quality-measured weights after /tmp is wiped
            art = REPO / "artifacts"
            art.mkdir(parents=True, exist_ok=True)
            (art / "distill_student_12.bin").write_bytes(
                cpath.read_bytes() if cpath.exists()
                else serialization.to_bytes(fetch_params(params))
            )
            log("saved 12-step student -> artifacts/distill_student_12.bin")
    log(f"distilled {START_STEPS} -> {END_STEPS} steps "
        f"in {time.time() - t0:.0f}s total")
    publish()


if __name__ == "__main__":
    main()
