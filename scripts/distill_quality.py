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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
from make_parity import (  # noqa: E402
    BATCH,
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
STEPS_PER_ROUND = 1500
SCORE_BUDGETS = (25, 12, 6, 3)  # sample + score the student here


def main():
    from flax import serialization

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

    cache = pathlib.Path("/tmp/fewstep_params.bin")
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

    def batches():
        while True:
            idx = train_idx[
                order_rng.choice(len(train_idx), BATCH, replace=False)
            ]
            yield {k: jnp.asarray(v[idx]) for k, v in batch_all.items()}

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
    # way down (the round-n student is the n-step sampler).
    t0 = time.time()
    it = batches()
    params = teacher
    n_steps = START_STEPS
    while True:
        # warmup-cosine per round + unweighted eps loss: the measured
        # non-corrupting recipe (scripts/probe_distill_r3.py;
        # FEWSTEP.json['distill_probe'])
        cfg = DistillConfig(
            learning_rate=1e-4, num_student_steps=n_steps,
            warmup_steps=200, total_steps=STEPS_PER_ROUND,
        )
        d = ProgressiveDistiller(model, diffusion, params, cfg)
        state = d.init_state()
        tr = time.time()
        for k in range(STEPS_PER_ROUND):
            state, _ = d.distill_step(
                state, next(it),
                jax.random.fold_in(jax.random.key(11), n_steps * 100003 + k),
            )
        params = state.ema_params
        log(f"round n={n_steps}: {STEPS_PER_ROUND} steps "
            f"in {time.time() - tr:.0f}s")
        if n_steps in SCORE_BUDGETS:
            score(params, n_steps, f"distilled_{n_steps}_clip", True)
            if n_steps == 25:
                score(params, n_steps, "distilled_25", False)
            (pathlib.Path(f"/tmp/distill_student_{n_steps}.bin")
             .write_bytes(serialization.to_bytes(params)))
        if n_steps <= END_STEPS:
            break
        n_steps //= 2
    log(f"distilled {START_STEPS} -> {END_STEPS} steps "
        f"in {time.time() - t0:.0f}s total")

    # append the distilled section to docs/FEWSTEP.md
    metrics = [
        ("rmse", "RMSE"), ("mae", "MAE"), ("crps", "CRPS"),
        ("wasserstein1", "W1"), ("ks", "KS"), ("fid_rf", "FID (rf)"),
        ("morans_i_gen", "Moran's I"),
        ("frac_outside_truth_range", "out-of-range"),
    ]
    budget_cols = [f"distilled_{b}_clip" for b in SCORE_BUDGETS]
    lines = [
        "",
        "## Distilled students (same held-out fields)",
        "",
        f"Progressive distillation ({START_STEPS} -> {END_STEPS} DDIM",
        f"steps, {STEPS_PER_ROUND} steps/round, teacher = the model",
        "above), student scored at each serving budget on the way down",
        "(all with clip_denoised, like the training-free rows):",
        "",
        "| metric | " + " | ".join(f"{b} steps" for b in SCORE_BUDGETS)
        + " | (training-free DPM++ 25) |",
        "|---|" + "---|" * (len(SCORE_BUDGETS) + 1),
    ]
    few = json.loads((REPO / "FEWSTEP.json").read_text())
    for key, label in metrics:
        cells = " | ".join(
            f"{results[c]['heldout_' + key]:.3f}" for c in budget_cols
        )
        lines.append(
            f"| {label} | {cells} "
            f"| {few['dpmpp2m_25']['heldout_' + key]:.3f} |"
        )
    lines += ["", "Generated by `scripts/distill_quality.py`; raw in",
              "`FEWSTEP.json` (distilled keys, incl. an unclipped",
              "distilled_25)."]
    with open(REPO / "docs" / "FEWSTEP.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    few.update(results)
    (REPO / "FEWSTEP.json").write_text(json.dumps(few, indent=1))
    log("appended distilled section to docs/FEWSTEP.md")


if __name__ == "__main__":
    main()
