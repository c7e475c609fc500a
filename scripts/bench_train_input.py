"""Real-data train throughput: zarr-store -> native crop/SDF -> prefetch
-> device, measured as sustained train steps/s at the flagship config
(128px, batch 32) next to the synthetic-input number.

The reference's training died on exactly this host path (SURVEY hot-loop
#5: per-sample zarr reads + full-domain EDT per crop inside the loader,
data_DANRA_conditional.py:1118-1190). The rebuild's cure is the native
EDT + threaded batch assembler (data/dataset.py BatchLoader,
native/dmc_host.cpp) + background device prefetch (data/pipeline.py);
this script publishes the proof: steps/s with the full store-backed
pipeline must be within ~10% of the synthetic-tensor number.

Run (TPU):  python scripts/bench_train_input.py
            python scripts/bench_train_input.py --steps 40 --days 128
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

BATCH, SIZE = 32, 128
FULL = (589, 789)  # the DANRA full domain the reference cuts from


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_store(root: pathlib.Path, days: int):
    from diffusionmodelscustom_tpu.data import (
        make_synthetic_store,
        synthetic_geography,
    )

    hr = root / "hr_store"
    lr = root / "lr_store"
    if hr.exists():
        return hr, lr
    root.mkdir(parents=True, exist_ok=True)
    log(f"building synthetic full-domain store ({days} days @ {FULL}) ...")
    lsm, topo = synthetic_geography(FULL)
    np.savez(root / "lsm.npz", data=lsm)
    np.savez(root / "topo.npz", data=topo)
    make_synthetic_store(hr, n_days=days, shape=FULL, lsm=lsm, seed=1)
    make_synthetic_store(lr, n_days=days, shape=FULL, lowres_factor=4, seed=2)
    return hr, lr


def build_loader(root: pathlib.Path, hr, lr, workers: int):
    from diffusionmodelscustom_tpu.data import (
        BatchLoader,
        DanraDataset,
        DanraDatasetConfig,
    )

    lsm = np.load(root / "lsm.npz")["data"]
    topo = np.load(root / "topo.npz")["data"]
    cfg = DanraDatasetConfig(
        data_size=(SIZE, SIZE),
        conditional_seasons=True,
        conditional_images=True,
        n_classes=4,
        cutouts=True,
        cutout_domains=(0, FULL[0], 0, FULL[1]),
        cutout_size=SIZE,
        sdf_weighted_loss=True,
        seed=0,
    )
    ds = DanraDataset(
        hr, cfg, cond_store_path=lr, lsm_full_domain=lsm, topo_full_domain=topo
    )
    return ds, BatchLoader(ds, BATCH, seed=0, num_workers=workers)


def make_trainer():
    import jax.numpy as jnp

    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.models import ConditionalUNet
    from diffusionmodelscustom_tpu.train import Trainer, TrainerConfig

    model = ConditionalUNet(
        out_channels=1,
        base_channels=64,
        time_dim=256,
        n_heads=4,
        num_classes=4,
        cond_img_channels=1,
        cond_on_lsm=True,
        cond_on_topo=True,
        attention_levels=(1, 2, 3),
        attention_levels_up=(2, 1),
        dtype=jnp.bfloat16,
    )
    diffusion = GaussianDiffusion.create(n_timesteps=1000)
    trainer = Trainer(
        model,
        diffusion,
        TrainerConfig(loss="sdfweighted", cfg_dropout_prob=0.1, num_classes=4,
                      ema=True),
    )
    return trainer


def run_steps(trainer, state, batches, rng):
    """Chained steps (state dependency makes the final fetch a true sync
    on the axon remote backend — CLAUDE.md timing discipline)."""
    m = None
    for i, batch in enumerate(batches):
        state, m = trainer.train_step(state, batch, jax.random.fold_in(rng, i))
    # host fetch = the only real sync
    loss = float(np.asarray(jax.device_get(m["loss"])))
    assert np.isfinite(loss)
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--days", type=int, default=128)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--root", default="/tmp/dmc_input_bench")
    args = ap.parse_args()

    root = pathlib.Path(args.root)
    hr, lr = build_store(root, args.days)
    ds, loader = build_loader(root, hr, lr, args.workers)
    trainer = make_trainer()

    from diffusionmodelscustom_tpu.data import prefetch_to_device

    def cycle(dl):
        """Epoch-cycling batch stream (the loader reshuffles per pass);
        drops the cutout 'points' bookkeeping key the train step doesn't
        take."""
        while True:
            for b in dl:
                yield {k: v for k, v in b.items() if k != "points"}

    rng = jax.random.key(0)
    it = iter(prefetch_to_device(cycle(loader), buffer_size=2))
    first = next(it)
    state = trainer.init_state(rng, first)
    # compile + warmup (2 steps so donation settles)
    state = run_steps(trainer, state, [first, next(it)], jax.random.key(9))
    log("compiled; timing store-backed pipeline ...")

    t0 = time.perf_counter()
    batches = (next(it) for _ in range(args.steps))
    state = run_steps(trainer, state, batches, rng)
    dt_real = time.perf_counter() - t0
    real_sps = args.steps / dt_real
    log(f"store-backed: {real_sps:.2f} steps/s ({dt_real:.1f}s)")

    # --- compact device feed: packed uint16 buffer + on-device geo ------
    # (data/device_feed.py — one H2D put per step, lsm/topo/sdf rebuilt on
    # chip from resident full-domain arrays, EDT included)
    import concurrent.futures

    import jax.numpy as jnp

    from diffusionmodelscustom_tpu.data.device_feed import (
        CompactBatcher,
        make_compact_train_step,
    )

    pool = concurrent.futures.ThreadPoolExecutor(args.workers)
    batcher = CompactBatcher(ds, BATCH, pool=pool)
    fin = batcher.make_finisher()
    step = make_compact_train_step(trainer, fin)
    n_total = len(ds)
    rng_idx = np.random.default_rng(0)

    def buf_stream():
        """Background-threaded host packing + device_put double buffer."""
        def produce(_):
            idx = rng_idx.choice(n_total, BATCH, replace=False)
            return jnp.asarray(batcher.load(idx))

        with concurrent.futures.ThreadPoolExecutor(1) as io:
            fut = io.submit(produce, None)
            while True:
                buf = fut.result()
                fut = io.submit(produce, None)
                yield buf

    bufs = buf_stream()
    state2 = trainer.init_state(jax.random.key(1), first)
    for i in range(2):  # compile + donation warmup
        state2, m = step(state2, next(bufs), jax.random.fold_in(rng, 100 + i))
    float(np.asarray(jax.device_get(m["loss"])))
    log("compiled; timing compact device feed ...")
    t0 = time.perf_counter()
    for i in range(args.steps):
        state2, m = step(state2, next(bufs), jax.random.fold_in(rng, i))
    loss = float(np.asarray(jax.device_get(m["loss"])))
    assert np.isfinite(loss)
    dt_compact = time.perf_counter() - t0
    compact_sps = args.steps / dt_compact
    log(f"compact-feed: {compact_sps:.2f} steps/s ({dt_compact:.1f}s)")

    # synthetic baseline: one resident device batch reused (the 15.2
    # steps/s configuration) — same step fn, zero host involvement
    synth = {k: jax.device_put(np.asarray(v)) for k, v in first.items()}
    state = run_steps(trainer, state, [synth] * 3, jax.random.key(10))
    t0 = time.perf_counter()
    state = run_steps(trainer, state, [synth] * args.steps, rng)
    dt_synth = time.perf_counter() - t0
    synth_sps = args.steps / dt_synth
    log(f"synthetic-resident: {synth_sps:.2f} steps/s ({dt_synth:.1f}s)")

    out = {
        "metric": "train_steps_per_s_store_backed",
        "batch": BATCH,
        "size": SIZE,
        "steps": args.steps,
        "store_backed_steps_per_s": round(real_sps, 3),
        "compact_feed_steps_per_s": round(compact_sps, 3),
        "synthetic_steps_per_s": round(synth_sps, 3),
        # efficiency per pipeline, vs the synthetic-resident ceiling
        "pipeline_efficiency": round(real_sps / synth_sps, 4),
        "compact_feed_efficiency": round(compact_sps / synth_sps, 4),
        "note": "full path: DirectoryStore zarr-layout reads -> native "
        "crop/resize/per-cutout SDF -> threaded BatchLoader -> "
        "prefetch_to_device double buffer",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
