"""Sample-time stochastic churn vs the two Moran's-I parity cells
(round-2 VERDICT item 5a).

The only losing parity cells are Moran's I on the uniform and
unconditional variants: our sharper fields carry more high-frequency
texture than the truth, the reference's oversmoothed gen sits closer.
Train-time levers (D4 aug, cond jitter) are measured regressions
(PARITY.md §3). The untried lever: EDM-style S_churn stochasticity
injected at SAMPLE time into the DDPM ancestral chain
(`ancestral_sample(churn=...)`, sampling/ancestral.py; reference
analogue elucidated_imagen.py:393-549) — extra noise injected and
re-denoised each step lets the model's own denoiser smooth
high-frequency residue without touching training.

Protocol: train each variant ONCE at its PARITY.md budget (params cached
under /tmp so sweep reruns are sampling-only), then sweep churn over the
same 100 matched-conditioning fields and score calibration/held-out
Moran + the full card. Results append to PARITY.json["churn_probe"].

Run (TPU):  python scripts/probe_churn.py [--variant uniform|unconditional]
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

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
from make_parity import (  # noqa: E402
    BATCH,
    N_TIMESTEPS,
    N_TRAIN,
    VARIANT_STEPS,
    VARIANTS,
    log,
    scale,
    unscale,
)

CHURNS = (0.0, 0.05, 0.1, 0.2, 0.4)


def run_variant(variant: str, churns=CHURNS) -> dict:
    from flax import serialization

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

    b = load_reference_bundles()[variant]
    truth = b["eval"]
    lsm = b["lsm"]
    has_cond = b.get("cond") is not None
    has_season = b.get("season") is not None
    has_lsm = lsm is not None
    loss = "sdfweighted" if "sdfweighted" in variant else "simple"
    train_steps = VARIANT_STEPS.get(variant, 12000)

    batch_all = {"img": scale(truth)[..., None].astype(np.float32)}
    if has_cond:
        cond = np.clip(b["cond"], -40.0, 40.0)
        batch_all["img_cond"] = scale(cond)[..., None].astype(np.float32)
    if has_lsm:
        sdf = np.stack([normalize_sdf(generate_sdf(m)) for m in (lsm > 0.5)])
        batch_all["lsm"] = lsm[..., None].astype(np.float32)
        batch_all["topo"] = np.zeros_like(lsm)[..., None].astype(np.float32)
        batch_all["sdf"] = sdf[..., None].astype(np.float32)
    if has_season:
        batch_all["classifier"] = b["season"].astype(np.int32)

    model = ConditionalUNet(
        out_channels=1, base_channels=64, time_dim=256, n_heads=4,
        num_classes=4 if has_season else None,
        cond_img_channels=1 if has_cond else 0,
        cond_on_lsm=has_lsm, cond_on_topo=has_lsm,
        attention_levels=(1, 2, 3), attention_levels_up=(2, 1),
        dtype=jnp.bfloat16,
    )
    diffusion = GaussianDiffusion.create(
        n_timesteps=N_TIMESTEPS, beta_min=1e-4, beta_max=0.02,
        scheduler="linear",
    )
    trainer = Trainer(
        model, diffusion,
        TrainerConfig(loss=loss, learning_rate=3e-4, ema=True,
                      num_classes=4 if has_season else None,
                      cfg_dropout_prob=0.0, lr_scheduler="warmup_cosine",
                      warmup_steps=300, total_steps=train_steps),
    )
    rng = jax.random.key(0)
    state = trainer.init_state(
        rng, {k: v[:BATCH] for k, v in batch_all.items()}
    )

    n = len(truth)
    perm = np.random.default_rng(42).permutation(n)
    train_idx = np.sort(perm[:N_TRAIN])
    hold_idx = np.sort(perm[N_TRAIN:])

    short = variant.split("__")[0]
    cache = pathlib.Path(f"/tmp/churn_{short}_params.bin")
    if cache.exists():
        params = serialization.from_bytes(state.params, cache.read_bytes())
        log(f"[{short}] params loaded from {cache}")
    else:
        log(f"[{short}] training {train_steps} steps (PARITY budget)...")
        t0 = time.time()
        order_rng = np.random.default_rng(0)
        for step in range(train_steps):
            idx = train_idx[
                order_rng.choice(len(train_idx), BATCH, replace=False)
            ]
            batch = {k: v[idx] for k, v in batch_all.items()}
            state, m = trainer.train_step(
                state, batch, jax.random.fold_in(rng, step)
            )
            if step % 4000 == 0:
                log(f"  step {step}: "
                    f"loss={float(jax.device_get(m['loss'])):.4f} "
                    f"({time.time() - t0:.0f}s)")
        log(f"[{short}] trained in {time.time() - t0:.0f}s")
        params = (
            state.ema_params if state.ema_params is not None
            else state.params
        )
        cache.write_bytes(serialization.to_bytes(params))

    results = {}
    chunk = 25
    for churn in churns:
        gens = []
        t0 = time.time()
        for start in range(0, n, chunk):
            sl = slice(start, start + chunk)
            cb = {k: jnp.asarray(v[sl]) for k, v in batch_all.items()}

            def denoise(x, t):
                return model.apply(
                    {"params": params}, x, t,
                    cb.get("classifier"), cb.get("img_cond"),
                    cb.get("lsm"), cb.get("topo"),
                )

            out = ancestral_sample(
                denoise, diffusion,
                jax.random.fold_in(jax.random.key(7), start),
                (cb["img"].shape[0], 64, 64, 1),
                clip_denoised=True, churn=churn,
            )
            gens.append(np.asarray(jax.device_get(out))[..., 0])
        gen = unscale(np.concatenate(gens))
        row = {}
        for split, idx in (("calibration", train_idx), ("heldout", hold_idx)):
            mask = lsm[idx] if has_lsm else None
            card = parity_scorecard(gen[idx], truth[idx], mask)
            card["fid_rf"] = fid(gen[idx], truth[idx])
            ref_card = parity_scorecard(b["gen"][idx], truth[idx], mask)
            row[split] = {k: round(float(v), 4) for k, v in card.items()}
            row[split]["ref_moran"] = round(
                float(ref_card["morans_i_gen"]), 4
            )
            log(f"[{short} churn={churn}] {split}: "
                f"moran={card['morans_i_gen']:.3f} "
                f"(ref {ref_card['morans_i_gen']:.3f}, "
                f"ideal {card.get('morans_i_ref', 0):.3f}) "
                f"rmse={card['rmse']:.2f} fid={card['fid_rf']:.1f} "
                f"oor={card['frac_outside_truth_range']:.3f} "
                f"({time.time() - t0:.0f}s)")
        results[f"churn_{churn}"] = row
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None,
                    choices=[None, "uniform", "unconditional"])
    ap.add_argument("--churns", default=None,
                    help="comma-separated churn values (default sweep)")
    args = ap.parse_args()
    churns = (
        tuple(float(c) for c in args.churns.split(","))
        if args.churns else CHURNS
    )
    targets = [
        v for v in VARIANTS
        if ("uniform" in v or "unconditional" in v)
        and (args.variant is None or args.variant in v)
    ]
    out = {}
    for v in targets:
        out[v.split("__")[0]] = run_variant(v, churns)

    pj = REPO / "PARITY.json"
    d = json.loads(pj.read_text()) if pj.exists() else {}
    d.setdefault("churn_probe", {}).update(out)
    pj.write_text(json.dumps(d, indent=1))
    log("churn probe written to PARITY.json['churn_probe']")


if __name__ == "__main__":
    main()
