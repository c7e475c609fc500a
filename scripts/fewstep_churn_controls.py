"""Training-free churn controls for the fresh-distilled table.

scripts/distill_fresh.py measured sample-time churn rescuing the
distilled 12-step student to teacher-level held-out RMSE/FID (2.56/12.3
at churn 0.1). The comparison needs the SAME churn applied to the
training-free DDIM-12 chain on the teacher: if churned DDIM-12 matches
the churned student, the win is churn alone; if not, distillation is
load-bearing at the 12-step budget. Also scores churned DDIM-6 (the
graceful-degradation control). Appends ``ddim_{12,6}_churn{c}`` keys to
FEWSTEP.json; the distill_fresh publisher picks every ``*_churn*`` key
up on its next run.

Run (TPU, ~5 min warm): python scripts/fewstep_churn_controls.py
"""

import json
import pathlib
import sys

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
    N_TIMESTEPS,
    N_TRAIN,
    TRAIN_STEPS,
    VARIANTS,
    log,
    params_cache_path,
    scale,
    unscale,
)

VARIANT = VARIANTS[0]
CHURNS = (0.02, 0.05, 0.1)
BUDGETS = (12, 6)


def main():
    import argparse

    from flax import serialization

    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", default=",".join(map(str, BUDGETS)),
                    help="csv of teacher DDIM budgets to churn-score")
    ap.add_argument("--churns", default=",".join(f"{c:g}" for c in CHURNS))
    ap.add_argument("--student_budgets", default="",
                    help="csv of distill_r5f student budgets to ALSO "
                         "churn-score (loads artifacts/distill caches)")
    ap.add_argument("--int8", action="store_true",
                    help="score through the FULL int8 serving mode "
                         "(dynamic-int8 convs + int8 QK/PV attention — "
                         "bench.py's danra128serve configuration); keys "
                         "get an _int8 suffix")
    args = ap.parse_args()
    budgets = [int(x) for x in args.budgets.split(",") if x]
    churns = [float(x) for x in args.churns.split(",") if x]
    student_budgets = [
        int(x) for x in args.student_budgets.split(",") if x
    ]

    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.evaluation.fid import fid
    from diffusionmodelscustom_tpu.evaluation.parity import (
        load_reference_bundles,
        parity_scorecard,
    )
    from diffusionmodelscustom_tpu.models import ConditionalUNet
    from diffusionmodelscustom_tpu.sampling import ddim_sample

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
    suffix = ""
    if args.int8:
        model = model.clone(conv_quant=True, attn_pv_int8=True)
        suffix = "_int8"
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
    teacher = jax.device_put(serialization.from_bytes(
        tmpl, params_cache_path(VARIANT, TRAIN_STEPS).read_bytes()
    ))
    log("teacher loaded")

    n = len(truth)
    perm = np.random.default_rng(42).permutation(n)
    train_idx = np.sort(perm[:N_TRAIN])
    hold_idx = np.sort(perm[N_TRAIN:])

    results = {}
    chunk = 25

    def score_chain(params, ns, c, mode):
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
                num_steps=ns, clip_denoised=True, churn=c,
            )
            gens.append(np.asarray(jax.device_get(out))[..., 0])
        gen = unscale(np.concatenate(gens))
        cards = {}
        for split, idx in (
            ("calibration", train_idx), ("heldout", hold_idx)
        ):
            card = parity_scorecard(gen[idx], truth[idx], lsm[idx])
            card["fid_rf"] = fid(gen[idx], truth[idx])
            cards[split] = card
        results[mode] = {
            f"{s}_{k}": round(float(v), 4)
            for s, cc in cards.items() for k, v in cc.items()
        }
        h = cards["heldout"]
        log(f"[{mode}] heldout rmse={h['rmse']:.2f} "
            f"moran={h['morans_i_gen']:.3f} psd={h['psd_dist']:.3f} "
            f"fid={h['fid_rf']:.1f}")

    students = {}
    for ns in student_budgets:
        spath = (REPO / "artifacts" / "distill"
                 / f"distill_r5f_10000_{ns}.bin")
        students[ns] = jax.device_put(
            serialization.from_bytes(tmpl, spath.read_bytes())
        )
        log(f"student n={ns} loaded from {spath}")

    for c in churns:
        for ns in budgets:
            score_chain(teacher, ns, c, f"ddim_{ns}_churn{c:g}{suffix}")
        for ns, sp in students.items():
            score_chain(
                sp, ns, c, f"distilled_fresh_{ns}_churn{c:g}{suffix}"
            )
    few = json.loads((REPO / "FEWSTEP.json").read_text())
    few.update(results)
    (REPO / "FEWSTEP.json").write_text(json.dumps(few, indent=1))
    log(f"appended {len(results)} control keys to FEWSTEP.json")


if __name__ == "__main__":
    main()
