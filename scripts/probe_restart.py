"""Restart-sampling probe for the few-step serving plateau (round 5).

The 6-step churned DDIM chain plateaus at held-out RMSE ~3.3 (FEWSTEP
churn table) while 12-step reaches 2.50. Restart sampling (Xu et al.
2023, arXiv:2306.14878) spends the same eval budget differently: a short
base descent, then forward-noise the output back to a mid timestep and
re-descend — the re-descent contracts accumulated discretization error
faster than extra uniform steps. Built from existing pieces:
``ddim_sample`` + the round-5 ``t_start`` knob + ``diffusion.q_sample``.

Scores recipes on the parity teacher with the standard held-out harness;
appends ``restart_{n1}p{n2}_t{tr}_c{c1}x{c2}`` keys to FEWSTEP.json
(total evals = n1 + n2 — compare against ``ddim_{n}_churn*`` rows at the
same budget).

Run (TPU): python scripts/probe_restart.py
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
# (n1 base steps, c1 base churn, t_restart, n2 re-descent steps, c2)
RECIPES = [
    # budget 6: beat ddim_6_churn0.4 (heldout rmse 3.36 / fid 17.6)
    (4, 0.2, 150, 2, 0.3),
    (4, 0.2, 300, 2, 0.3),
    (3, 0.2, 300, 3, 0.5),
    (4, 0.3, 200, 2, 0.8),
    # budget 12: beat ddim_12_churn0.2 (2.50 / 7.9 / moran 0.706)
    (8, 0.1, 200, 4, 0.3),
    (8, 0.2, 400, 4, 0.4),
]


def main():
    import argparse

    from flax import serialization

    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.evaluation.fid import fid
    from diffusionmodelscustom_tpu.evaluation.parity import (
        load_reference_bundles,
        parity_scorecard,
    )
    from diffusionmodelscustom_tpu.models import ConditionalUNet
    from diffusionmodelscustom_tpu.sampling import ddim_sample

    ap = argparse.ArgumentParser()
    ap.add_argument("--recipes", default=None,
                    help="override: semicolon list n1,c1,tr,n2,c2")
    ap.add_argument("--int8", action="store_true",
                    help="score through the FULL int8 serving mode "
                         "(keys get an _int8 suffix)")
    args = ap.parse_args()
    recipes = RECIPES
    if args.recipes:
        recipes = []
        for r in args.recipes.split(";"):
            n1, c1, tr, n2, c2 = r.split(",")
            recipes.append(
                (int(n1), float(c1), int(tr), int(n2), float(c2))
            )

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

    for n1, c1, tr, n2, c2 in recipes:
        mode = f"restart_{n1}p{n2}_t{tr}_c{c1:g}x{c2:g}{suffix}"
        gens = []
        for start in range(0, n, chunk):
            sl = slice(start, start + chunk)
            cb = {k: jnp.asarray(v[sl]) for k, v in batch_all.items()}

            def denoise(x, t):
                return model.apply(
                    {"params": teacher}, x, t, cb["classifier"],
                    cb["img_cond"], cb["lsm"], cb["topo"],
                )

            k0 = jax.random.fold_in(jax.random.key(7), start)
            base = ddim_sample(
                denoise, diffusion, k0,
                (cb["img"].shape[0], 64, 64, 1),
                num_steps=n1, clip_denoised=True, churn=c1,
            )
            t_r = jnp.full((base.shape[0],), tr, jnp.int32)
            x_r, _ = diffusion.noise_image(
                jax.random.fold_in(k0, 1), base, t_r
            )
            out = ddim_sample(
                denoise, diffusion, jax.random.fold_in(k0, 2),
                (cb["img"].shape[0], 64, 64, 1),
                num_steps=n2, clip_denoised=True, churn=c2,
                t_start=tr, x_init=x_r,
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
            for s, cc in cards.items() for k, v in cc.items()
        }
        h = cards["heldout"]
        log(f"[{mode}] ({n1 + n2} evals) heldout rmse={h['rmse']:.2f} "
            f"moran={h['morans_i_gen']:.3f} psd={h['psd_dist']:.3f} "
            f"fid={h['fid_rf']:.1f}")

    few = json.loads((REPO / "FEWSTEP.json").read_text())
    few.update(results)
    (REPO / "FEWSTEP.json").write_text(json.dumps(few, indent=1))
    log(f"appended {len(results)} restart keys to FEWSTEP.json")


if __name__ == "__main__":
    main()
