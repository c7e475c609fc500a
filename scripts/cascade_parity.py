"""Imagen cascade on the REAL DANRA parity fields (round-3 VERDICT item 7).

The reference vendored imagen-pytorch for climate super-resolution but
never connected it to its own DANRA data (imagen_pytorch.py:4007-4280 —
cascade sampling exercised only on web images). This script closes that
loop on OUR side: a two-stage ElucidatedImagen (EDM base 32px -> SR
32->64) trained through ImagenTrainer on the ERA5 parity variant's 80
TRAIN fields, conditioned on the variant's (ERA5 cond, lsm) pair via the
cascade's cond_images channel (imagen_pytorch.py:2360,2963-2967), then
all 100 matched-conditioning fields sampled through the full cascade and
scored with the SAME parity harness/metrics as PARITY.md §2
(calibration = the 80 train fields, held-out = the 20 never seen).

Output: a scorecard section appended to CASCADE.md + raw cards in
PARITY.json under ["cascade"], and the generated fields cached in
artifacts/parity/.

Run (TPU, alone):  python scripts/cascade_parity.py [--steps N]
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
    N_TRAIN,
    VARIANT,
    log,
    scale,
    unscale,
)

BATCH = 20
TRAIN_STEPS = 8000  # per stage; EDM converges much faster than T=800 DDPM
SAMPLE_CHUNK = 25


def build_cascade():
    from diffusionmodelscustom_tpu.core import EDMConfig
    from diffusionmodelscustom_tpu.models.imagen import (
        ElucidatedImagen,
        ImagenUNet,
    )

    # no text anywhere: conditioning is purely the (cond, lsm) image pair
    base = ImagenUNet(
        dim=64, dim_mults=(1, 2, 3), channels=1,
        num_resnet_blocks=2, layer_attns=(False, True, True),
        layer_cross_attns=False, attn_heads=4, cond_on_text=False,
        cond_images_channels=2, dtype=jnp.bfloat16,
    )
    sr = ImagenUNet(
        dim=48, dim_mults=(1, 2, 4), channels=1,
        num_resnet_blocks=2, layer_attns=(False, False, True),
        layer_cross_attns=False, attn_heads=4, cond_on_text=False,
        lowres_cond=True, cond_images_channels=2, dtype=jnp.bfloat16,
    )
    return ElucidatedImagen(
        unets=[base, sr],
        image_sizes=(32, 64),
        channels=1,
        condition_on_text=False,
        cond_drop_prob=0.0,
        edm=EDMConfig(num_sample_steps=32),
    )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=TRAIN_STEPS)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--no_write", action="store_true")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            jax.config.update("jax_num_cpu_devices", 1)

    from flax import serialization

    from diffusionmodelscustom_tpu.evaluation.fid import fid
    from diffusionmodelscustom_tpu.evaluation.parity import (
        load_reference_bundles,
        parity_scorecard,
    )
    from diffusionmodelscustom_tpu.train.imagen_trainer import (
        ImagenTrainer,
        ImagenTrainerConfig,
    )

    bundles = load_reference_bundles()
    b = bundles[VARIANT]
    truth = b["eval"]  # (100, 64, 64) Celsius
    lsm = b["lsm"]
    cond = np.clip(b["cond"], -40.0, 40.0)
    n = len(truth)

    # [0,1] image space (the cascade's auto_normalize contract); cond
    # images carry the scaled ERA5 field + the land-sea mask
    images01 = ((scale(truth) + 1.0) / 2.0)[..., None].astype(np.float32)
    cond_img = np.stack(
        [scale(cond), lsm.astype(np.float32) * 2.0 - 1.0], axis=-1
    ).astype(np.float32)

    perm = np.random.default_rng(42).permutation(n)
    train_idx = np.sort(perm[:N_TRAIN])
    hold_idx = np.sort(perm[N_TRAIN:])

    cascade = build_cascade()
    trainer = ImagenTrainer(
        cascade,
        ImagenTrainerConfig(
            learning_rate=1e-4, warmup_steps=500, use_ema=True
        ),
    )

    cache = pathlib.Path(f"/tmp/cascade_parity_{args.steps}.bin")
    order_rng = np.random.default_rng(0)
    if cache.exists():
        log(f"loading cached trainer state {cache}")
        for stage in (1, 2):  # materialize state templates
            trainer.init_unet(stage, jax.random.key(stage))
        trainer.load_state_dict(
            serialization.from_bytes(trainer.state_dict(), cache.read_bytes())
        )
    else:
        for stage in (1, 2):
            t0 = time.time()
            for k in range(args.steps):
                idx = train_idx[
                    order_rng.choice(len(train_idx), BATCH, replace=False)
                ]
                loss = trainer.train_step(
                    stage,
                    jnp.asarray(images01[idx]),
                    cond_images=jnp.asarray(cond_img[idx]),
                    rng=jax.random.fold_in(
                        jax.random.key(stage), k
                    ),
                )
                if k % 1000 == 0:
                    log(f"  stage {stage} step {k}: loss={loss:.4f} "
                        f"({time.time() - t0:.0f}s)")
            log(f"stage {stage}: {args.steps} steps in "
                f"{time.time() - t0:.0f}s")
        cache.write_bytes(serialization.to_bytes(trainer.state_dict()))

    # ---- sample the full cascade on all 100 matched conditions ---------
    gens = []
    t0 = time.time()
    for start in range(0, n, SAMPLE_CHUNK):
        sl = slice(start, start + SAMPLE_CHUNK)
        out = trainer.sample(
            jax.random.fold_in(jax.random.key(7), start),
            batch_size=int(images01[sl].shape[0]),
            cond_images=jnp.asarray(cond_img[sl]),
        )
        gens.append(np.asarray(jax.device_get(out))[..., 0])
    gen01 = np.concatenate(gens)
    log(f"cascade-sampled {n} in {time.time() - t0:.0f}s")
    gen = unscale(gen01 * 2.0 - 1.0)

    art = REPO / "artifacts" / "parity"
    art.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        art / f"gen_cascade_{args.steps}.npz", gen=gen.astype(np.float16)
    )

    cards = {}
    for split, idx in (("calibration", train_idx), ("heldout", hold_idx)):
        card = parity_scorecard(gen[idx], truth[idx], lsm[idx])
        card["fid_rf"] = fid(gen[idx], truth[idx])
        ref_card = parity_scorecard(b["gen"][idx], truth[idx], lsm[idx])
        ref_card["fid_rf"] = fid(b["gen"][idx], truth[idx])
        cards[split] = {"ours_cascade": card, "ref": ref_card}
        log(f"[cascade/{split}] rmse={card['rmse']:.2f} "
            f"w1={card['wasserstein1']:.2f} fid={card['fid_rf']:.2f} "
            f"moran={card['morans_i_gen']:.3f} "
            f"psd={card['psd_dist']:.3f} "
            f"oor={card['frac_outside_truth_range']:.3f}")

    if args.no_write:
        return

    cols = [
        ("rmse", "RMSE (degC)"), ("mae", "MAE (degC)"), ("crps", "CRPS"),
        ("wasserstein1", "Wasserstein-1"), ("ks", "KS distance"),
        ("fid_rf", "FID (rf)"), ("psd_dist", "PSD distance (log10)"),
        ("morans_i_gen", "Moran's I (gen)"),
        ("frac_outside_truth_range", "frac outside truth range"),
    ]
    lines = [
        "# Imagen cascade on the DANRA parity fields",
        "",
        "Two-stage ElucidatedImagen (EDM base 32px -> SR 32->64,",
        f"{args.steps} steps/stage, batch {BATCH}) trained on the ERA5",
        "parity variant's 80 TRAIN fields, conditioned on the (ERA5,",
        "lsm) image pair via cond_images, full-cascade-sampled on all",
        "100 matched conditions and scored with the PARITY.md harness.",
        "The reference vendored imagen-pytorch for exactly this use and",
        "never ran it on its own data (imagen_pytorch.py:4007-4280);",
        "the comparison column is the reference's shipped DDPM",
        "generation on the identical fields.",
        "",
    ]
    for split in ("calibration", "heldout"):
        oc = cards[split]["ours_cascade"]
        rc = cards[split]["ref"]
        nf = N_TRAIN if split == "calibration" else n - N_TRAIN
        lines += [
            f"## {split} ({nf} fields)", "",
            "| metric | reference gen (DDPM) | OURS (EDM cascade) | ideal |",
            "|---|---|---|---|",
        ]
        won = 0
        for key, label in cols:
            ideal = 0.0 if key != "morans_i_gen" else rc.get("morans_i_ref", 0)
            lines.append(
                f"| {label} | {rc[key]:.3f} | {oc[key]:.3f} | {ideal:.3f} |"
            )
            if abs(oc[key] - ideal) <= abs(rc[key] - ideal) + 1e-9:
                won += 1
        lines += ["", f"Matches or beats the reference on {won}/{len(cols)}.",
                  ""]
    lines += ["Generated by `scripts/cascade_parity.py`; raw cards in",
              "`PARITY.json` under `cascade`; fields in",
              f"`artifacts/parity/gen_cascade_{args.steps}.npz`.", ""]
    (REPO / "CASCADE.md").write_text("\n".join(lines))

    pj_path = REPO / "PARITY.json"
    pj = json.loads(pj_path.read_text()) if pj_path.exists() else {}
    pj["cascade"] = {
        "train_steps_per_stage": args.steps,
        **{
            s: {k: {m: round(float(x), 4) for m, x in c.items()}
                for k, c in cards[s].items()}
            for s in cards
        },
    }
    pj_path.write_text(json.dumps(pj, indent=1))
    log("wrote CASCADE.md + PARITY.json['cascade']")


if __name__ == "__main__":
    main()
