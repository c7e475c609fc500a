"""Training CLI — the rebuild of the reference's experiment drivers.

Covers the entry surface of:

* g2 ``ddpm_DANRA_conditional_wValid.py`` (constants-in-script driver,
  :58-679): stores, geo fields, datasets, model, diffusion, epoch loop
  with best-val checkpointing and per-epoch metrics;
* g3 ``test/launch.py`` (argparse flags, :22-74) + ``main_ddpm``
  (src/main_ddpm.py:53-566): optimizer/scheduler selection, early
  stopping, periodic sampling.

Flags mirror launch.py's names (lowercased); everything funnels into the
typed ExperimentConfig, which can also be loaded from YAML (--config) and
overridden with dotted keys (--set training.lr=1e-4).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train a TPU-native DDPM for climate-field downscaling"
    )
    p.add_argument("--config", type=str, default=None, help="YAML config path")
    p.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="dotted config override, e.g. training.lr=1e-4",
    )
    # launch.py flag surface (test/launch.py:28-69)
    p.add_argument("--hr_var", type=str, default=None)
    p.add_argument("--hr_size", type=int, default=None)
    p.add_argument("--lr_size", type=int, default=None)
    p.add_argument("--path_data", type=str, default=None)
    p.add_argument("--path_save", type=str, default=None)
    p.add_argument("--path_checkpoint", type=str, default=None)
    p.add_argument("--in_channels", type=int, default=None)
    p.add_argument("--out_channels", type=int, default=None)
    p.add_argument("--loss_type", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--time_embedding_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--n_timesteps", type=int, default=None)
    p.add_argument("--beta_min", type=float, default=None)
    p.add_argument("--beta_max", type=float, default=None)
    p.add_argument("--beta_scheduler", type=str, default=None)
    p.add_argument("--num_heads", type=int, default=None)
    p.add_argument("--optimizer", type=str, default=None)
    p.add_argument("--lr_scheduler", type=str, default=None)
    p.add_argument("--early_stopping", action="store_true", default=None)
    p.add_argument("--no-early_stopping", dest="early_stopping", action="store_false")
    p.add_argument("--cfg_scale", type=float, default=None)
    p.add_argument("--model_family", type=str, default=None,
                   choices=["flagship", "danra", "danra_ffn"])
    p.add_argument("--device_feed", action="store_true",
                   help="compact device feed: ship one packed uint16 "
                        "buffer per batch and reconstruct the geography "
                        "channels (lsm/topo crops, EDT-SDF) on device "
                        "(data/device_feed.py)")
    p.add_argument("--synthetic", action="store_true",
                   help="run on generated synthetic data (no archive needed)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu"],
                   help="force a JAX platform (cpu useful for smoke runs)")
    p.add_argument("--n_virtual_devices", type=int, default=None,
                   help="with --platform cpu: number of virtual devices")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint (full state: params,"
                        " optimizer, EMA, step) before training")
    p.add_argument("--create_figs", action="store_true",
                   help="save loss curves and a generated-sample grid")
    p.add_argument("--sample_every", type=int, default=0,
                   help="every N epochs, sample a small grid to figures/ "
                        "(the reference's periodic in-training sampling, "
                        "ddpm_DANRA_conditional_wValid.py:522-658)")
    return p


def apply_platform(args) -> None:
    """Must run before the first JAX operation."""
    if getattr(args, "platform", None) == "cpu":
        jax.config.update("jax_platforms", "cpu")
        if args.n_virtual_devices:
            jax.config.update("jax_num_cpu_devices", args.n_virtual_devices)


_FLAG_TO_KEY = {
    "hr_var": "data.hr_var",
    "path_data": "data.path_data",
    "path_save": "data.path_save",
    "path_checkpoint": "data.path_checkpoint",
    "in_channels": "unet.in_channels",
    "out_channels": "unet.out_channels",
    "loss_type": "training.loss_type",
    "epochs": "training.epochs",
    "batch_size": "training.batch_size",
    "time_embedding_size": "unet.time_embedding_size",
    "lr": "training.lr",
    "weight_decay": "training.weight_decay",
    "n_timesteps": "diffusion.n_timesteps",
    "beta_min": "diffusion.beta_min",
    "beta_max": "diffusion.beta_max",
    "beta_scheduler": "diffusion.beta_scheduler",
    "num_heads": "unet.num_heads",
    "optimizer": "training.optimizer",
    "lr_scheduler": "training.lr_scheduler",
    "early_stopping": "training.early_stopping",
    "cfg_scale": "diffusion.cfg_scale",
    "model_family": "unet.family",
    "seed": "training.seed",
}


def config_from_args(args) -> "ExperimentConfig":
    from ..utils.config import ExperimentConfig

    cfg = (
        ExperimentConfig.load_yaml(args.config)
        if args.config
        else ExperimentConfig()
    )
    updates = {}
    for flag, key in _FLAG_TO_KEY.items():
        value = getattr(args, flag, None)
        if value is not None:
            updates[key] = value
    if args.hr_size is not None:
        updates["data.hr_shape"] = (args.hr_size, args.hr_size)
    if args.lr_size is not None:
        updates["data.lr_shape"] = (args.lr_size, args.lr_size)
    for item in args.overrides:
        key, _, raw = item.partition("=")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        updates[key] = value
    return cfg.update(updates) if updates else cfg


def build_model(cfg):
    """Model-family registry: flagship perf UNet or DANRA parity nets."""
    from ..models import ConditionalUNet, DiffusionNet

    if cfg.unet.family == "flagship":
        return ConditionalUNet(
            out_channels=cfg.unet.out_channels,
            base_channels=cfg.unet.base_channels,
            channel_mults=tuple(cfg.unet.channel_mults),
            time_dim=cfg.unet.time_embedding_size,
            n_heads=cfg.unet.num_heads,
            num_classes=cfg.unet.num_classes,
            cond_img_channels=cfg.unet.in_channels if cfg.unet.cond_on_img else 0,
            cond_on_lsm=cfg.unet.cond_on_lsm,
            cond_on_topo=cfg.unet.cond_on_topo,
            attention_levels=tuple(cfg.unet.attention_levels),
            attention_levels_up=tuple(cfg.unet.attention_levels_up),
            dtype=jnp.bfloat16
            if cfg.unet.precision == "bfloat16"
            else jnp.float32,
        )
    if cfg.unet.family in ("danra", "danra_ffn"):
        return DiffusionNet(
            output_channels=cfg.unet.out_channels,
            time_embedding=cfg.unet.time_embedding_size,
            n_heads=cfg.unet.num_heads,
            num_classes=cfg.unet.num_classes,
            use_attention_ffn=cfg.unet.family == "danra_ffn",
        )
    raise ValueError(f"unknown model family {cfg.unet.family!r}")


def build_data(cfg, synthetic: bool):
    """Datasets + loaders (+ geo fields). With --synthetic, fabricates a
    store so the pipeline runs without the private DANRA archive."""
    from ..data import (
        BatchLoader,
        DanraDataset,
        DanraDatasetConfig,
        make_synthetic_store,
        synthetic_geography,
    )

    root = Path(cfg.data.path_data)
    hr = root / "hr_store"
    lr = root / "lr_store"
    size = tuple(cfg.data.hr_shape)
    if synthetic and not hr.exists():
        full = (max(size[0] * 2, 128),) * 2
        lsm, topo = synthetic_geography(full)
        np.savez(root / "lsm.npz", data=lsm) if root.exists() else root.mkdir(
            parents=True, exist_ok=True
        )
        np.savez(root / "lsm.npz", data=lsm)
        np.savez(root / "topo.npz", data=topo)
        make_synthetic_store(hr, n_days=64, shape=full, lsm=lsm, seed=1)
        make_synthetic_store(lr, n_days=64, shape=full, lowres_factor=4, seed=2)

    lsm = np.load(root / "lsm.npz")["data"] if (root / "lsm.npz").exists() else None
    topo = np.load(root / "topo.npz")["data"] if (root / "topo.npz").exists() else None
    full_hw = lsm.shape if lsm is not None else None

    ds_cfg = DanraDatasetConfig(
        variable=cfg.data.hr_var,
        data_size=size,
        scale=cfg.data.scaling,
        in_low=cfg.data.in_low,
        in_high=cfg.data.in_high,
        data_min_in=cfg.data.data_min,
        data_max_in=cfg.data.data_max,
        conditional_seasons=cfg.unet.num_classes is not None,
        conditional_images=cfg.unet.cond_on_img,
        n_classes=cfg.unet.num_classes,
        cutouts=cfg.data.cutouts and full_hw is not None,
        cutout_domains=(0, full_hw[0], 0, full_hw[1]) if full_hw else None,
        cutout_size=size[0],
        sdf_weighted_loss=cfg.data.sdf_weighted_loss
        or cfg.training.loss_type == "sdfweighted",
        cache_size=cfg.data.cache_size,
        field_cache_entries=cfg.data.field_cache_entries,
        seed=cfg.training.seed,
    )
    cond = lr if (cfg.unet.cond_on_img and lr.exists()) else None
    members_train = members_valid = None
    if cfg.data.split_type != "none":
        # held-out validation (launch.py:59-61 data_split_type surface):
        # early stopping / best-checkpoint selection must monitor data
        # the model never trains on
        from ..data.splits import split_files
        from ..data.store import open_group

        splits = split_files(
            list(open_group(hr, mode="r").keys()),
            split_type=cfg.data.split_type,
            train_size=cfg.data.train_size,
            val_size=cfg.data.val_size,
            test_size=cfg.data.test_size,
            seed=cfg.training.seed,
        )
        members_train, members_valid = splits["train"], splits["valid"]

    dataset = DanraDataset(
        hr,
        ds_cfg,
        cond_store_path=cond,
        lsm_full_domain=lsm,
        topo_full_domain=topo,
        members=members_train,
    )
    loader = BatchLoader(
        dataset,
        cfg.training.batch_size,
        seed=cfg.training.seed,
        num_workers=cfg.data.num_workers,
    )
    valid_dataset = None
    if members_valid:
        valid_dataset = DanraDataset(
            hr,
            ds_cfg,
            cond_store_path=cond,
            lsm_full_domain=lsm,
            topo_full_domain=topo,
            members=members_valid,
        )
    return dataset, loader, valid_dataset


def trainer_config_from_experiment(cfg, steps_per_epoch: int):
    """The ONE TrainerConfig construction for this experiment config.

    Used by training AND by every checkpoint-restoring CLI (generate /
    distill / serve): the optimizer chain's STRUCTURE (clip wrapper,
    MultiSteps, scheduler state, EMA) must match the training run's, or
    Orbax restore fails with a tree mismatch.
    """
    from ..train import TrainerConfig

    return TrainerConfig(
        loss=cfg.training.loss_type,
        optimizer=cfg.training.optimizer,
        learning_rate=cfg.training.lr,
        weight_decay=cfg.training.weight_decay,
        grad_clip_norm=cfg.training.grad_clip_norm,
        grad_accum_steps=cfg.training.grad_accum_steps,
        ema=cfg.training.ema,
        ema_decay=cfg.training.ema_decay,
        cfg_dropout_prob=cfg.training.cfg_dropout_prob,
        early_stopping_patience=cfg.training.early_stopping_patience
        if cfg.training.early_stopping
        else None,
        num_classes=cfg.unet.num_classes,
        hybrid_alpha=cfg.training.hybrid_alpha,
        hybrid_timesteps=cfg.training.hybrid_timesteps,
        # LR scheduler plumbing (src/main_ddpm.py:376-409;
        # plateau patience counted in epochs via accumulation_size)
        lr_scheduler=cfg.training.lr_scheduler,
        plateau_patience=cfg.training.plateau_patience,
        plateau_factor=cfg.training.plateau_factor,
        plateau_accumulation=steps_per_epoch,
        min_lr_ratio=cfg.training.min_lr / max(cfg.training.lr, 1e-12),
        warmup_steps=cfg.training.warmup_steps,
        total_steps=max(1, cfg.training.epochs) * steps_per_epoch,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    apply_platform(args)
    cfg = config_from_args(args)
    # the hybrid (VLB) loss regresses eps-space posterior terms; a flow
    # model predicts velocity, so training it against the hybrid target
    # would silently optimize the wrong objective (mirrors the process
    # guards in cli.inference / cli.distill)
    if cfg.diffusion.process == "flow" and cfg.training.loss_type == "hybrid":
        raise SystemExit(
            "diffusion.process 'flow' is incompatible with "
            "training.loss_type 'hybrid' (eps-space VLB objective); "
            "use 'simple'/'l1'/'huber' for flow training"
        )

    from ..core import make_process
    from ..data import prefetch_to_device
    from ..parallel import batch_sharding, make_mesh
    from ..train import Trainer, TrainerConfig
    from ..utils.checkpoint import CheckpointManager

    save_dir = Path(cfg.data.path_save)
    save_dir.mkdir(parents=True, exist_ok=True)
    cfg.save_yaml(save_dir / f"{cfg.name}_config.yaml")

    model = build_model(cfg)
    diffusion = make_process(
        cfg.diffusion.process,
        n_timesteps=cfg.diffusion.n_timesteps,
        beta_min=cfg.diffusion.beta_min,
        beta_max=cfg.diffusion.beta_max,
        scheduler=cfg.diffusion.beta_scheduler,
        data_scaled=cfg.diffusion.noise_variance > 0,
        time_sampling=cfg.diffusion.flow_time_sampling,
        logit_mean=cfg.diffusion.flow_logit_mean,
        logit_std=cfg.diffusion.flow_logit_std,
    )
    dataset, loader, valid_dataset = build_data(cfg, args.synthetic)
    steps_per_epoch = max(1, len(dataset) // cfg.training.batch_size)
    batcher = finisher = feed_pool = None
    if args.device_feed:
        # compact packed-buffer path: minimum H2D bytes, geography
        # reconstructed on device inside the compiled step
        import concurrent.futures

        from ..data.device_feed import CompactBatcher

        feed_pool = concurrent.futures.ThreadPoolExecutor(
            max(2, cfg.data.num_workers)
        )
        batcher = CompactBatcher(
            dataset, cfg.training.batch_size, pool=feed_pool
        )
        finisher = batcher.make_finisher()
    trainer = Trainer(
        model,
        diffusion,
        trainer_config_from_experiment(cfg, steps_per_epoch),
        batch_finisher=finisher,
    )
    mesh = make_mesh(cfg.training.n_data_shards, cfg.training.n_model_shards)
    sharding = batch_sharding(mesh)
    print(
        f"[train] dataset={len(dataset)} samples, mesh={dict(mesh.shape)}, "
        f"model={cfg.unet.family}",
        file=sys.stderr,
    )

    rng = jax.random.key(cfg.training.seed)
    if batcher is not None:
        n_ds = len(dataset)
        first_buf = batcher.load(
            [i % n_ds for i in range(cfg.training.batch_size)]
        )
        example = jax.jit(finisher)(jnp.asarray(first_buf))
        print(
            f"[train] device feed on: {first_buf.nbytes / 1e6:.2f} MB/batch "
            f"packed (geo channels rebuilt on device)",
            file=sys.stderr,
        )
    else:
        example = next(iter(loader))
        example.pop("points", None)
    state = trainer.init_state(rng, example)

    # model summary before training (the reference's torchinfo smoke test,
    # ddpm_DANRA_conditional_wValid.py:432-473)
    from ..utils.profiling import model_summary

    print(model_summary(state.params), file=sys.stderr)

    ckpt = CheckpointManager(
        save_dir / cfg.data.path_checkpoint, max_to_keep=3, best_mode="min"
    )
    if args.resume and ckpt.latest_step() is not None:
        # elastic recovery: exact-state resume (the reference lost optimizer
        # state on resume, src/main_ddpm.py:1-5 TODO)
        state = ckpt.restore(state)
        print(
            f"[train] resumed from checkpoint step {ckpt.latest_step()} "
            f"(train step {int(jax.device_get(state.step))})",
            file=sys.stderr,
        )

    feed_rng = np.random.default_rng(cfg.training.seed)

    def epoch_batches():
        if batcher is not None:
            # same shuffle/drop-last epoch semantics as BatchLoader, but
            # producing packed buffers (the loader's dict-batch assembly
            # doesn't apply; the batcher's thread pool parallelizes the
            # store reads inside load_batch instead)
            bs = cfg.training.batch_size
            order = feed_rng.permutation(len(dataset))

            def packed():
                for s in range(len(order) // bs):
                    yield batcher.load(order[s * bs:(s + 1) * bs])

            yield from prefetch_to_device(packed(), sharding=sharding)
            return
        for batch in prefetch_to_device(loader, sharding=sharding):
            batch.pop("points", None)
            yield batch

    # held-out validation loader (None -> fit monitors train loss; the
    # old behavior of passing the TRAIN loader as valid_loader scored
    # "validation" on training data and doubled every epoch's data pass)
    valid_batches = None
    if valid_dataset is not None:
        bs = cfg.training.batch_size
        if len(valid_dataset) < bs:
            print(
                f"[train] WARNING: validation split has {len(valid_dataset)}"
                f" samples < batch {bs}; monitoring train loss instead",
                file=sys.stderr,
            )
        elif batcher is not None:
            from ..data.device_feed import CompactBatcher as _CB

            valid_batcher = _CB(valid_dataset, bs, pool=feed_pool)

            def valid_batches():
                order = np.arange(len(valid_dataset))

                def packed():
                    for s in range(len(order) // bs):
                        yield valid_batcher.load(order[s * bs:(s + 1) * bs])

                yield from prefetch_to_device(packed(), sharding=sharding)
        else:
            from ..data import BatchLoader as _BL

            valid_loader = _BL(
                valid_dataset, bs, shuffle=False, drop_last=True,
                num_workers=cfg.data.num_workers,
            )

            def valid_batches():
                for batch in prefetch_to_device(valid_loader, sharding=sharding):
                    batch.pop("points", None)
                    yield batch

        if valid_batches is not None:
            print(
                f"[train] validation split: {len(valid_dataset)} held-out "
                f"samples ({cfg.data.split_type})",
                file=sys.stderr,
            )

    def log_fn(epoch, train_loss, valid_loss):
        print(
            f"[epoch {epoch}] train={train_loss:.5f} valid={valid_loss:.5f}",
            file=sys.stderr,
        )

    def save_grid(state, rng_tag: int, out_path) -> None:
        """DDIM-sample a small grid with EMA params and save it (the
        reference's periodic sample plots, ddpm…wValid.py:522-658)."""
        from ..sampling import ddim_sample, flow_sample
        from ..utils.plotting import save_sample_grid

        params = state.ema_params if state.ema_params is not None else state.params
        n_gen = min(cfg.data.n_gen_samples, cfg.training.batch_size)
        sb = {k: v[:n_gen] for k, v in example.items() if k != "points"}

        def denoise(x, t):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            return trainer.model.apply(
                variables, x, t, sb.get("classifier"), sb.get("img_cond"),
                sb.get("lsm"), sb.get("topo"),
            )

        num_steps = min(cfg.diffusion.ddim_steps, cfg.diffusion.n_timesteps // 2)
        sample_fn = (
            flow_sample if cfg.diffusion.process == "flow" else ddim_sample
        )
        gen = sample_fn(
            denoise, diffusion, jax.random.fold_in(rng, rng_tag),
            (n_gen, *example["img"].shape[1:]),
            num_steps=num_steps,
        )
        save_sample_grid(np.asarray(gen), out_path)
        print(f"[train] sample grid -> {out_path}", file=sys.stderr)

    def epoch_end_fn(state, epoch):
        if not args.sample_every or (epoch + 1) % args.sample_every:
            return
        save_grid(
            state, 1000 + epoch,
            save_dir / "figures" / f"samples_epoch{epoch:04d}.png",
        )

    t0 = time.time()
    try:
        with mesh:
            state, history = trainer.fit(
                state,
                train_loader=epoch_batches,
                valid_loader=valid_batches,
                epochs=cfg.training.epochs,
                rng=rng,
                checkpoint_fn=lambda s, e, m: ckpt.save(e, s, monitor=m),
                log_fn=log_fn,
                epoch_end_fn=epoch_end_fn,
            )
    finally:
        if feed_pool is not None:
            feed_pool.shutdown(wait=False)
    if args.create_figs:
        from ..utils.plotting import save_loss_curves

        save_loss_curves(history, save_dir / "figures" / "loss_curves.png")
        save_grid(state, 99, save_dir / "figures" / "samples.png")

    print(
        json.dumps(
            {
                "epochs_run": len(history["train_loss"]),
                "final_train_loss": history["train_loss"][-1],
                "final_valid_loss": history["valid_loss"][-1]
                if history["valid_loss"]
                else None,
                "wall_seconds": round(time.time() - t0, 2),
                "best_step": ckpt.best_step(),
            }
        )
    )
    ckpt.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
