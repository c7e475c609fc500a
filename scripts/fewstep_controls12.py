"""Training-free 12-step controls for the distilled-student table.

The distilled 12-step student (docs/FEWSTEP.md) needs same-budget
training-free baselines to make the comparison legible: DDIM-12 and
DPM-Solver++-2M-12 with the SAME teacher params on the SAME held-out
split. Appends `ddim_12` / `dpmpp2m_12` to FEWSTEP.json only; the
FEWSTEP.md controls paragraph is regenerated from those keys by
scripts/distill_quality.py::publish.

Run (TPU, ~5 min warm): python scripts/fewstep_controls12.py
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
    from diffusionmodelscustom_tpu.sampling import ddim_sample, dpmpp_2m_sample

    cache = params_cache_path(VARIANT, TRAIN_STEPS)
    assert cache.exists(), "teacher cache missing (fewstep_quality --teacher_only)"

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
    params = jax.device_put(
        serialization.from_bytes(tmpl, cache.read_bytes())
    )
    log("teacher loaded")

    n = len(truth)
    perm = np.random.default_rng(42).permutation(n)
    train_idx = np.sort(perm[:N_TRAIN])
    hold_idx = np.sort(perm[N_TRAIN:])

    few = json.loads((REPO / "FEWSTEP.json").read_text())
    chunk = 25
    for mode, sampler in (
        ("ddim_12", lambda dn, key, shape: ddim_sample(
            dn, diffusion, key, shape, num_steps=12, clip_denoised=True)),
        ("dpmpp2m_12", lambda dn, key, shape: dpmpp_2m_sample(
            dn, diffusion, key, shape, num_steps=12, clip_denoised=True)),
    ):
        gens = []
        for start in range(0, n, chunk):
            sl = slice(start, start + chunk)
            cb = {k: jnp.asarray(v[sl]) for k, v in batch_all.items()}

            def denoise(x, t):
                return model.apply(
                    {"params": params}, x, t, cb["classifier"],
                    cb["img_cond"], cb["lsm"], cb["topo"],
                )

            out = sampler(
                denoise, jax.random.fold_in(jax.random.key(7), start),
                (cb["img"].shape[0], 64, 64, 1),
            )
            gens.append(np.asarray(jax.device_get(out))[..., 0])
        gen = unscale(np.concatenate(gens))
        cards = {}
        for split, idx in (("calibration", train_idx), ("heldout", hold_idx)):
            card = parity_scorecard(gen[idx], truth[idx], lsm[idx])
            card["fid_rf"] = fid(gen[idx], truth[idx])
            cards[split] = card
        few[mode] = {
            f"{s}_{k}": round(float(v), 4)
            for s, c in cards.items() for k, v in c.items()
        }
        log(f"[{mode}] heldout rmse={cards['heldout']['rmse']:.2f} "
            f"fid={cards['heldout']['fid_rf']:.1f} "
            f"w1={cards['heldout']['wasserstein1']:.2f} "
            f"moran={cards['heldout']['morans_i_gen']:.3f}")
    (REPO / "FEWSTEP.json").write_text(json.dumps(few, indent=1))
    log("controls written to FEWSTEP.json")


if __name__ == "__main__":
    main()
