"""Generation CLI — rebuild of ``generation_DANRA_conditional.py`` (C14).

Loads a trained checkpoint, samples N fields with the fused-scan sampler,
and emits the reference's npz bundle naming so downstream evaluation is
drop-in compatible:

    gen_samples.npz / eval_samples.npz / lsm_samples.npz /
    cond_samples.npz / season_samples.npz / point_samples.npz

(generation_DANRA_conditional.py:431-441). The three conditioning
variants map to flags: --variant conditional|unconditional|lsm_topo|uniform
(generation_unconditional.py:133-137, generation_lsm_topo_only.py:135-139,
generation_DANRA_uniform.py:135-139).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .train import build_data, build_model, config_from_args, build_parser as _train_parser


def build_parser() -> argparse.ArgumentParser:
    p = _train_parser()
    p.description = "Generate fields from a trained DDPM checkpoint"
    p.add_argument("--n_samples", type=int, default=100,
                   help="number of fields to generate (ref default 100)")
    p.add_argument("--sample_batch", type=int, default=8)
    p.add_argument(
        "--variant",
        type=str,
        default="conditional",
        choices=["conditional", "unconditional", "lsm_topo", "uniform"],
    )
    p.add_argument("--sampler", type=str, default=None,
                   choices=["ancestral", "ddim", "dpmpp", "flow"])
    p.add_argument("--ddim_steps", type=int, default=None)
    p.add_argument("--churn", type=float, default=None,
                   help="sample-time stochastic churn for the ancestral "
                        "and ddim samplers (EDM S_churn analogue; 0 = "
                        "exact reference chain; 0.1 + --clip_denoised is "
                        "the measured few-step serving recipe, "
                        "docs/FEWSTEP.md)")
    p.add_argument("--clip_denoised", action="store_true", default=None,
                   help="clamp the per-step x0 estimate to [-1, 1] "
                        "(load-bearing below ~50 DDIM steps)")
    p.add_argument("--restart_t", type=int, default=None,
                   help="ddim restart re-descent start timestep "
                        "(docs/FEWSTEP.md restart table)")
    p.add_argument("--restart_steps", type=int, default=None,
                   help="extra re-descent steps after the base ddim "
                        "chain (0 = off)")
    p.add_argument("--restart_churn", type=float, default=None,
                   help="churn for the re-descent phase")
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no-use_ema", dest="use_ema", action="store_false",
                   help="sample with the raw (non-EMA) parameters")
    p.add_argument("--distilled", type=str, default=None,
                   help="cli.distill output dir: loads its params and "
                        "samples with DDIM at the manifest's step budget")
    p.add_argument("--conv_quant", action="store_true",
                   help="dynamic-int8 serving convs (flagship only; "
                        "approximate, ~+8%% throughput)")
    p.add_argument("--attn_pv_int8", action="store_true",
                   help="with --conv_quant: also quantize the attention "
                        "PV matmul (full int8 attention)")
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--full_domain", action="store_true",
                   help="generate WHOLE-DOMAIN fields (no cutouts): the "
                        "image height is sharded over the mesh 'model' "
                        "axis (spatial partitioning; XLA inserts conv "
                        "halo exchanges), so domains exceeding one "
                        "chip's memory scale across the mesh")
    return p


def _generate_full_domain(args, cfg, model, diffusion, dataset, loader):
    """Whole-domain spatially-sharded generation (SURVEY §5.7; round-2
    VERDICT item 7). Each sample is one full grid (e.g. DANRA's 589x789,
    edge-padded to /16); batch rides the mesh 'data' axis and image
    height the 'model' axis via spatial_batch_sharding."""
    from ..parallel import make_mesh, spatial_batch_sharding
    from ..sampling import (
        ancestral_sample,
        ddim_restart_sample,
        ddim_sample,
        dpmpp_2m_sample,
    )
    from .inference import load_inference_setup

    model, params, batch_stats, sampler_name, sampler_steps = (
        load_inference_setup(cfg, args, model, diffusion, loader)
    )
    n_dev = len(jax.devices())
    n_data = min(args.sample_batch, max(1, n_dev // 2))
    mesh = make_mesh(n_data, n_dev // n_data)
    sharding = spatial_batch_sharding(mesh)
    print(f"[generate] full-domain mesh data={n_data} "
          f"model={n_dev // n_data}", file=sys.stderr)

    rng = jax.random.key(cfg.training.seed)
    bundles = {k: [] for k in ("gen", "eval", "lsm", "cond", "season")}
    batch_size = args.sample_batch
    n_batches = -(-args.n_samples // batch_size)
    sample_jit = None
    for bi in range(n_batches):
        idxs = [(bi * batch_size + j) % len(dataset) for j in range(batch_size)]
        samples = [dataset.full_domain_sample(i) for i in idxs]
        h, w = samples[0]["img"].shape[:2]
        dh, dw = (int(v) for v in samples[0]["domain_shape"])
        batch = {
            k: jnp.asarray(np.stack([s[k] for s in samples]))
            for k in samples[0]
            if k != "domain_shape"
        }
        # conditioning fields ride the same spatial sharding as the
        # generated image so the UNet never gathers a full field
        put = lambda v: jax.device_put(v, sharding) if v is not None and v.ndim == 4 else v
        y = batch.get("classifier")
        cond = put(batch.get("img_cond"))
        lsm = put(batch.get("lsm"))
        topo = put(batch.get("topo"))

        if sample_jit is None:

            def run(y, cond, lsm, topo, key):
                variables = {"params": params}
                if batch_stats is not None:
                    variables["batch_stats"] = batch_stats

                def denoise(x, t):
                    return model.apply(variables, x, t, y, cond, lsm, topo)

                shape = (batch_size, h, w, cfg.unet.out_channels)
                clip = cfg.diffusion.clip_denoised
                if sampler_name == "ddim":
                    if cfg.diffusion.restart_steps > 0:
                        return ddim_restart_sample(
                            denoise, diffusion, key, shape,
                            num_steps=sampler_steps,
                            restart_t=cfg.diffusion.restart_t,
                            restart_steps=cfg.diffusion.restart_steps,
                            churn=cfg.diffusion.churn,
                            restart_churn=cfg.diffusion.restart_churn,
                            clip_denoised=clip)
                    return ddim_sample(denoise, diffusion, key, shape,
                                       num_steps=sampler_steps,
                                       clip_denoised=clip,
                                       churn=cfg.diffusion.churn)
                if sampler_name == "dpmpp":
                    return dpmpp_2m_sample(denoise, diffusion, key, shape,
                                           num_steps=sampler_steps,
                                           clip_denoised=clip)
                return ancestral_sample(denoise, diffusion, key, shape,
                                        clip_denoised=clip,
                                        churn=cfg.diffusion.churn)

            sample_jit = jax.jit(run, out_shardings=sharding)

        with mesh:
            out = sample_jit(y, cond, lsm, topo,
                             jax.random.fold_in(rng, 2000 + bi))
        # crop the /16 padding back to the true domain
        bundles["gen"].append(np.asarray(out)[:, :dh, :dw])
        bundles["eval"].append(np.asarray(batch["img"])[:, :dh, :dw])
        if "lsm" in batch:
            bundles["lsm"].append(np.asarray(batch["lsm"])[:, :dh, :dw])
        if "img_cond" in batch:
            bundles["cond"].append(np.asarray(batch["img_cond"])[:, :dh, :dw])
        if "classifier" in batch:
            bundles["season"].append(np.asarray(batch["classifier"]))
        print(f"[generate] full-domain batch {bi + 1}/{n_batches} "
              f"({dh}x{dw} padded to {h}x{w})", file=sys.stderr)

    out_dir = Path(args.out_dir
                   or Path(cfg.data.path_save) / "generated_samples_full")
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for key, chunks in bundles.items():
        if not chunks:
            continue
        arr = np.concatenate(chunks)[: args.n_samples]
        path = out_dir / f"{key}_samples.npz"
        np.savez_compressed(path, data=arr)
        written.append(path.name)
    print(json.dumps({"n_samples": args.n_samples, "files": written,
                      "out_dir": str(out_dir), "full_domain": True}))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from .train import apply_platform

    apply_platform(args)
    cfg = config_from_args(args)
    if args.sampler:
        cfg = cfg.update({"diffusion.sampler": args.sampler})
    if args.ddim_steps:
        cfg = cfg.update({"diffusion.ddim_steps": args.ddim_steps})
    if args.churn is not None:
        cfg = cfg.update({"diffusion.churn": args.churn})
    if args.clip_denoised is not None:
        cfg = cfg.update({"diffusion.clip_denoised": args.clip_denoised})
    for f in ("restart_t", "restart_steps", "restart_churn"):
        v = getattr(args, f)
        if v is not None:
            cfg = cfg.update({f"diffusion.{f}": v})

    from ..core import make_process
    from ..sampling import (
        ancestral_sample,
        ddim_restart_sample,
        ddim_sample,
        dpmpp_2m_sample,
        flow_sample,
    )
    from .inference import load_inference_setup

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
    dataset, loader, _ = build_data(cfg, args.synthetic)
    if args.full_domain:
        return _generate_full_domain(args, cfg, model, diffusion,
                                     dataset, loader)

    # restore best checkpoint (generation_DANRA_conditional.py:353-360);
    # shared with cli.serve so the two entry points cannot drift
    rng = jax.random.key(cfg.training.seed)
    model, params, batch_stats, sampler_name, sampler_steps = (
        load_inference_setup(cfg, args, model, diffusion, loader)
    )

    size = tuple(cfg.data.hr_shape)
    variant = args.variant
    bundles = {k: [] for k in ("gen", "eval", "lsm", "cond", "season", "point")}

    n_batches = -(-args.n_samples // args.sample_batch)
    it = iter(loader)
    sample_jits = {}
    for bi in range(n_batches):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        b = min(args.sample_batch, batch["img"].shape[0])
        batch = {k: jnp.asarray(v[:b]) for k, v in batch.items()}

        y = batch.get("classifier") if variant in ("conditional", "uniform") else None
        cond = batch.get("img_cond") if variant in ("conditional", "uniform") else None
        lsm = batch.get("lsm") if variant in ("conditional", "lsm_topo") else None
        topo = batch.get("topo") if variant in ("conditional", "lsm_topo") else None

        # one jitted sampler per batch size (the tail batch may be
        # smaller): eager-mode samplers re-trace the UNet scan body per
        # call (seconds of host time each)
        sample_jit = sample_jits.get(b)
        if sample_jit is None:

            def run(y, cond, lsm, topo, key, b=b):
                variables = {"params": params}
                if batch_stats is not None:
                    variables["batch_stats"] = batch_stats

                def denoise(x, t):
                    return model.apply(variables, x, t, y, cond, lsm, topo)

                def uncond(x, t):
                    return model.apply(variables, x, t, None, None, None, None)

                shape = (b, size[0], size[1], cfg.unet.out_channels)
                kw = dict(
                    uncond_fn=uncond if cfg.diffusion.cfg_scale > 0 else None,
                    cfg_scale=cfg.diffusion.cfg_scale,
                )
                kw["clip_denoised"] = cfg.diffusion.clip_denoised
                if sampler_name == "ddim":
                    if cfg.diffusion.restart_steps > 0:
                        return ddim_restart_sample(
                            denoise, diffusion, key, shape,
                            num_steps=sampler_steps,
                            restart_t=cfg.diffusion.restart_t,
                            restart_steps=cfg.diffusion.restart_steps,
                            churn=cfg.diffusion.churn,
                            restart_churn=cfg.diffusion.restart_churn,
                            **kw,
                        )
                    return ddim_sample(
                        denoise, diffusion, key, shape,
                        num_steps=sampler_steps,
                        churn=cfg.diffusion.churn, **kw,
                    )
                if sampler_name == "dpmpp":
                    return dpmpp_2m_sample(
                        denoise, diffusion, key, shape,
                        num_steps=sampler_steps, **kw,
                    )
                if sampler_name == "flow":
                    return flow_sample(
                        denoise, diffusion, key, shape,
                        num_steps=sampler_steps,
                        method=cfg.diffusion.flow_method, **kw,
                    )
                return ancestral_sample(denoise, diffusion, key, shape,
                                        churn=cfg.diffusion.churn, **kw)

            sample_jit = sample_jits[b] = jax.jit(run)

        sample_rng = jax.random.fold_in(rng, 1000 + bi)
        out = sample_jit(y, cond, lsm, topo, sample_rng)
        bundles["gen"].append(np.asarray(out))
        bundles["eval"].append(np.asarray(batch["img"]))
        if "lsm" in batch:
            bundles["lsm"].append(np.asarray(batch["lsm"]))
        if "img_cond" in batch:
            bundles["cond"].append(np.asarray(batch["img_cond"]))
        if "classifier" in batch:
            bundles["season"].append(np.asarray(batch["classifier"]))
        if "points" in batch:
            bundles["point"].append(np.asarray(batch["points"]))
        print(f"[generate] batch {bi + 1}/{n_batches} done", file=sys.stderr)

    out_dir = Path(args.out_dir or Path(cfg.data.path_save) / "generated_samples")
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for key, chunks in bundles.items():
        if not chunks:
            continue
        arr = np.concatenate(chunks)[: args.n_samples]
        path = out_dir / f"{key}_samples.npz"
        np.savez_compressed(path, data=arr)
        written.append(path.name)
    print(json.dumps({"n_samples": args.n_samples, "files": written,
                      "out_dir": str(out_dir)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
