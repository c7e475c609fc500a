"""Why did the first full distill_quality run corrupt the student?

Observed (run 1, flat lr 1e-4, 1500 steps/round): distilled_25_clip
heldout RMSE 12.57 / FID(rf) 2583 — WORSE than the training-free
DDIM-25 row (5.65 / 185), i.e. distillation actively damaged the model.
The target math is unit-pinned (tests/test_distill.py inverts ddim_step
exactly), so the suspect is the optimization recipe: the teacher ends
its warmup-cosine at ~0 lr fully converged; restarting a fresh flat-lr
Adam on it takes large early steps ("Adam restart shock") that a
1500-step round on 80 fields never recovers from.

This probe runs ONE distillation round (N=400, 1500 steps) per recipe
and scores the student at DDIM-50-clip on the same held-out protocol,
against the teacher scored identically:

  teacher      — no distillation (the bar any round-1 student must hold)
  flat1e-4     — run-1 recipe (reproduces the corruption?)
  warmcos      — warmup 200 + cosine to 0 over the round
  flat3e-5     — just a smaller flat lr
  clip1        — flat 1e-4 + grad clip 1.0

Run (TPU, teacher cache required):  python scripts/probe_distill_r3.py
Appends results to FEWSTEP.json["distill_probe"].
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
ROUND_STEPS = 1500
N_STUDENT = 400
SCORE_STEPS = 50


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
        raise SystemExit("run scripts/fewstep_quality.py --teacher_only first")

    b = load_reference_bundles()[VARIANT]
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
    tmpl = model.init(
        jax.random.key(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)),
    )["params"]
    teacher = serialization.from_bytes(tmpl, cache.read_bytes())
    log("teacher loaded")

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

    def score(params, mode):
        gens = []
        for start in range(0, n, chunk):
            sl = slice(start, start + chunk)
            cb = {k: jnp.asarray(v[sl]) for k, v in batch_all.items()}

            def denoise(x, t):
                return model.apply(
                    {"params": params}, x, t, cb["classifier"],
                    cb["img_cond"], cb["lsm"], cb["topo"],
                )

            out = ddim_sample(
                denoise, diffusion,
                jax.random.fold_in(jax.random.key(7), start),
                (cb["img"].shape[0], 64, 64, 1),
                num_steps=SCORE_STEPS, clip_denoised=True,
            )
            gens.append(np.asarray(jax.device_get(out))[..., 0])
        gen = unscale(np.concatenate(gens))
        card = parity_scorecard(gen[hold_idx], truth[hold_idx], lsm[hold_idx])
        card["fid_rf"] = fid(gen[hold_idx], truth[hold_idx])
        results[mode] = {k: round(float(v), 4) for k, v in card.items()}
        log(f"[{mode}] heldout rmse={card['rmse']:.2f} "
            f"w1={card['wasserstein1']:.2f} "
            f"moran={card['morans_i_gen']:.3f} fid={card['fid_rf']:.1f}")

    # each distinct optimizer/loss HLO is a fresh ~10-min remote compile,
    # so arms run in small batches selected by --recipes
    all_recipes = {
        # run-1 recipe (reproduces the corruption: 5.41 -> 11.18)
        "flat1e-4": DistillConfig(
            learning_rate=1e-4, num_student_steps=N_STUDENT),
        # warmup-cosine: helps (8.63) but still corrupts; loss still rises
        "warmcos": DistillConfig(
            learning_rate=1e-4, num_student_steps=N_STUDENT,
            warmup_steps=200, total_steps=ROUND_STEPS),
        # unbounded eps-space SNR weight (max(1, 1/SNR) ~ 3100x at t=799)
        # is the prime divergence suspect: unweighted arms
        "flat_nw": DistillConfig(
            learning_rate=1e-4, num_student_steps=N_STUDENT,
            snr_loss_weight=False),
        "warmcos_nw": DistillConfig(
            learning_rate=1e-4, num_student_steps=N_STUDENT,
            warmup_steps=200, total_steps=ROUND_STEPS,
            snr_loss_weight=False),
    }
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--recipes", default="flat1e-4,warmcos")
    ap.add_argument("--skip_teacher", action="store_true")
    args = ap.parse_args()
    if not args.skip_teacher:
        score(teacher, "teacher")
    recipes = {k: all_recipes[k] for k in args.recipes.split(",")}
    for name, cfg in recipes.items():
        it = batches()
        d = ProgressiveDistiller(model, diffusion, teacher, cfg)
        state = d.init_state()
        t0 = time.time()
        first = last = None
        for k in range(ROUND_STEPS):
            state, m = d.distill_step(
                state, next(it),
                jax.random.fold_in(jax.random.key(11), k),
            )
            if k == 0:
                first = float(jax.device_get(m["loss"]))
        last = float(jax.device_get(m["loss"]))
        log(f"[{name}] round in {time.time() - t0:.0f}s "
            f"loss {first:.4f} -> {last:.4f}")
        score(state.ema_params, name)
        results[name]["loss_first"] = round(first, 5)
        results[name]["loss_last"] = round(last, 5)

    fj = REPO / "FEWSTEP.json"
    d = json.loads(fj.read_text()) if fj.exists() else {}
    d.setdefault("distill_probe", {}).update(results)
    fj.write_text(json.dumps(d, indent=1))
    log("wrote FEWSTEP.json['distill_probe']")


if __name__ == "__main__":
    main()
