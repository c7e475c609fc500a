"""Probe: close the last parity losing cell (uniform-variant HELD-OUT
Moran's I — 0.745 ours vs 0.811 ref gen, 0.922 ideal, PARITY.md).

OUTCOME (measured, PARITY.md §3 / CLAUDE.md negative results): every
probed lever LOSES. D4 augmentation dilutes the single fixed geography
across 8 fake ones (held-out Moran 0.644 / RMSE 9.43 at 24k; 0.699 /
2.01 at 48k+EMA 0.999, vs 0.745 / 2.27 baseline); cond jitter reaches
Moran 0.783 only by unlearning the mean-value condition (RMSE 11.46).
The parity protocol keeps the no-aug baseline; this probe is retained
as the measurement harness.

Usage (TPU, one process at a time):
    nohup python scripts/probe_uniform_moran.py --aug none --steps 24000 \
        > /tmp/moran_base.log 2>&1 &
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

VARIANT = (
    "DDPM_conditional_uniform__temp__64x64__uniform_cond_lsm_topo_random__"
    "sdfweighted__4_seasons_ValidSplitInTime_9yrs"
)
N_TIMESTEPS = 800
BATCH = 20
N_TRAIN = 80
DATA_MIN, DATA_MAX = -15.0, 30.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scale(x):
    return (np.clip(x, DATA_MIN, DATA_MAX) - DATA_MIN) / (DATA_MAX - DATA_MIN) * 2 - 1


def unscale(x):
    return (np.asarray(x) + 1) / 2 * (DATA_MAX - DATA_MIN) + DATA_MIN


def augment(batch: dict, rng: np.random.Generator, mode: str) -> dict:
    """Apply one random dihedral transform per sample, identically to all
    spatial keys (img/img_cond/lsm/topo/sdf are geographically locked)."""
    if mode == "none":
        return batch
    spatial = [k for k in ("img", "img_cond", "lsm", "topo", "sdf")
               if k in batch]
    n = len(batch["img"])
    out = {k: v.copy() if k in spatial else v for k, v in batch.items()}
    flips_h = rng.random(n) < 0.5
    flips_v = (rng.random(n) < 0.5) if mode == "d4" else np.zeros(n, bool)
    rots = rng.integers(0, 4, n) if mode == "d4" else np.zeros(n, int)
    for i in range(n):
        for k in spatial:
            a = out[k][i]
            if flips_h[i]:
                a = a[:, ::-1]
            if flips_v[i]:
                a = a[::-1]
            if rots[i]:
                a = np.rot90(a, rots[i], axes=(0, 1))
            out[k][i] = a
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aug", default="none", choices=["none", "flip", "d4"])
    ap.add_argument("--steps", type=int, default=24000)
    ap.add_argument("--ema_decay", type=float, default=0.995)
    ap.add_argument("--cond_jitter", type=float, default=0.0,
                    help="train-time per-sample scalar noise (std, scaled "
                         "units) added to the uniform cond image — the "
                         "Imagen lowres-aug trick applied to the mean-value "
                         "condition, so the cond->field mapping generalizes "
                         "to held-out cond values")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.data.geo import generate_sdf, normalize_sdf
    from diffusionmodelscustom_tpu.evaluation.fid import fid
    from diffusionmodelscustom_tpu.evaluation.parity import (
        load_reference_bundles,
        parity_scorecard,
    )
    from diffusionmodelscustom_tpu.models import ConditionalUNet
    from diffusionmodelscustom_tpu.sampling import ancestral_sample
    from diffusionmodelscustom_tpu.train import Trainer, TrainerConfig

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
    trainer = Trainer(
        model, diffusion,
        TrainerConfig(loss="sdfweighted", learning_rate=3e-4, ema=True,
                      ema_decay=args.ema_decay,
                      num_classes=4, cfg_dropout_prob=0.0,
                      lr_scheduler="warmup_cosine", warmup_steps=300,
                      total_steps=args.steps),
    )
    rng = jax.random.key(0)
    state = trainer.init_state(rng, {k: v[:BATCH] for k, v in batch_all.items()})

    n = len(truth)
    perm = np.random.default_rng(42).permutation(n)
    train_idx = np.sort(perm[:N_TRAIN])
    hold_idx = np.sort(perm[N_TRAIN:])
    log(f"aug={args.aug} steps={args.steps} ema={args.ema_decay}")
    t0 = time.time()
    order_rng = np.random.default_rng(0)
    aug_rng = np.random.default_rng(1)
    for step in range(args.steps):
        idx = train_idx[order_rng.choice(len(train_idx), BATCH, replace=False)]
        batch = {k: v[idx] for k, v in batch_all.items()}
        batch = augment(batch, aug_rng, args.aug)
        if args.cond_jitter:
            batch["img_cond"] = batch["img_cond"] + aug_rng.normal(
                0.0, args.cond_jitter, (len(idx), 1, 1, 1)
            ).astype(np.float32)
        state, m = trainer.train_step(state, batch, jax.random.fold_in(rng, step))
        if step % 2000 == 0:
            log(f"  step {step}: loss={float(jax.device_get(m['loss'])):.4f}"
                f" ({time.time() - t0:.0f}s)")
    log(f"trained {args.steps} steps in {time.time() - t0:.0f}s")

    params = state.ema_params if state.ema_params is not None else state.params
    gens = []
    t0 = time.time()
    chunk = 25
    for start in range(0, n, chunk):
        sl = slice(start, start + chunk)
        cb = {k: jnp.asarray(v[sl]) for k, v in batch_all.items()}

        def denoise(x, t):
            return model.apply(
                {"params": params}, x, t, cb["classifier"], cb["img_cond"],
                cb["lsm"], cb["topo"],
            )

        out = ancestral_sample(
            denoise, diffusion, jax.random.fold_in(jax.random.key(7), start),
            (cb["img"].shape[0], 64, 64, 1),
            clip_denoised=True,
        )
        gens.append(np.asarray(jax.device_get(out))[..., 0])
    log(f"sampled {n} in {time.time() - t0:.0f}s")
    gen = unscale(np.concatenate(gens))

    results = {}
    for split, idx in (("calibration", train_idx), ("heldout", hold_idx)):
        card = parity_scorecard(gen[idx], truth[idx], lsm[idx])
        card["fid_rf"] = fid(gen[idx], truth[idx])
        ref_card = parity_scorecard(b["gen"][idx], truth[idx], lsm[idx])
        results[split] = {"ours": card, "ref_moran": ref_card["morans_i_gen"],
                          "ideal_moran": card.get("morans_i_ref")}
        log(f"[{split}] moran={card['morans_i_gen']:.3f} "
            f"(ref {ref_card['morans_i_gen']:.3f}, "
            f"ideal {card.get('morans_i_ref', 0):.3f}) "
            f"rmse={card['rmse']:.3f} w1={card['wasserstein1']:.3f} "
            f"ks={card['ks']:.3f} fid={card['fid_rf']:.3f} "
            f"oor={card['frac_outside_truth_range']:.3f} "
            f"crps={card['crps']:.3f} mae={card['mae']:.3f} "
            f"bias={card['bias']:.3f}")

    tag = args.tag or f"{args.aug}_{args.steps}_{args.ema_decay}"
    out_path = pathlib.Path(f"/tmp/moran_probe_{tag}.json")
    out_path.write_text(json.dumps(results, indent=1, default=float))
    np.savez_compressed(f"/tmp/moran_gen_{tag}.npz", gen=gen)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
