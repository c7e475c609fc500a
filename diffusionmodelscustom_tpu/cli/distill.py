"""Progressive-distillation CLI: teacher checkpoint -> few-step student.

Companion to ``cli.train`` (same experiment config surface): load a
trained teacher from the training run's checkpoint directory, run the
halving schedule of ``train.distill.progressive_distill`` on the same
dataset, and save the distilled student parameters plus a manifest
recording the sampler budget it was distilled for.

    python -m diffusionmodelscustom_tpu.cli.distill \\
        --config examples/danra64_conditional.yaml \\
        --teacher runs/.../checkpoints --start_steps 8 --end_steps 4 \\
        --steps_per_round 2000 --out runs/.../distilled

Sampling then uses the fused DDIM scan at the distilled budget:
``ddim_sample(denoise, diffusion, key, shape, num_steps=manifest.num_steps)``
(or ``cli.generate --sampler ddim --sampler_steps N``).

Beyond-reference capability: the reference has only T-step ancestral
samplers (diffusion_DANRA_conditional.py:105-159).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from .train import apply_platform, build_data, build_model, build_parser, config_from_args


def build_distill_parser():
    p = build_parser()
    p.prog = "diffusionmodelscustom_tpu.cli.distill"
    p.add_argument("--teacher", type=str, required=True,
                   help="training checkpoint dir (CheckpointManager) or a "
                        "save_pytree params path")
    p.add_argument("--out", type=str, required=True,
                   help="output dir for distilled params + manifest.json")
    p.add_argument("--start_steps", type=int, default=8)
    p.add_argument("--end_steps", type=int, default=4)
    p.add_argument("--steps_per_round", type=int, default=1000)
    p.add_argument("--distill_lr", type=float, default=1e-4)
    p.add_argument("--use_ema_teacher", action="store_true", default=True,
                   help="promote the teacher's EMA params (default)")
    p.add_argument("--no-use_ema_teacher", dest="use_ema_teacher",
                   action="store_false")
    return p


def _load_teacher(args, trainer, example, rng):
    """Teacher params from either checkpoint format."""
    import jax

    path = Path(args.teacher)
    state = trainer.init_state(rng, example)
    # a CheckpointManager directory holds numbered step subdirectories;
    # anything else is treated as a save_pytree params path
    is_manager = path.is_dir() and any(
        q.is_dir() and q.name.isdigit() for q in path.iterdir()
    )
    if is_manager:
        from ..utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(path, max_to_keep=3, best_mode="min")
        # prefer the best-validation checkpoint, as generate/serve do
        # (explicit None check: a best step of 0 is falsy)
        step = ckpt.best_step()
        if step is None:
            step = ckpt.latest_step()
        state = ckpt.restore(state, step=step)
        print(f"[distill] teacher from manager step {step}", file=sys.stderr)
    else:
        from ..utils.checkpoint import restore_pytree

        params = restore_pytree(path, state.params)
        state = state.replace(params=params)
        print(f"[distill] teacher params from {path}", file=sys.stderr)
    if args.use_ema_teacher and state.ema_params is not None:
        return state.ema_params
    return state.params


def main(argv=None) -> int:
    args = build_distill_parser().parse_args(argv)
    apply_platform(args)

    import jax

    from ..core import GaussianDiffusion
    from ..train import Trainer
    from ..train.distill import DistillConfig, progressive_distill
    from ..utils.checkpoint import save_pytree

    cfg = config_from_args(args)
    if cfg.diffusion.process != "ddpm":
        # progressive distillation's closed-form targets are eps-space
        # DDIM inverses (train/distill.py); a flow-trained velocity model
        # needs no distillation stage — its ODE is natively few-step
        raise SystemExit(
            "cli.distill supports diffusion.process='ddpm' only "
            f"(got {cfg.diffusion.process!r})"
        )
    model = build_model(cfg)
    dataset, loader, _ = build_data(cfg, args.synthetic)
    diffusion = GaussianDiffusion.create(
        n_timesteps=cfg.diffusion.n_timesteps,
        beta_min=cfg.diffusion.beta_min,
        beta_max=cfg.diffusion.beta_max,
        scheduler=cfg.diffusion.beta_scheduler,
    )
    # the restore template's optimizer tree must mirror the training
    # run's (clip wrapper / MultiSteps / scheduler state), or Orbax fails
    # with a structure mismatch — use the one shared construction
    from .train import trainer_config_from_experiment

    trainer = Trainer(model, diffusion, trainer_config_from_experiment(cfg, 1))

    rng = jax.random.key(cfg.training.seed)
    example = next(iter(loader))
    example.pop("points", None)
    teacher = _load_teacher(args, trainer, example, rng)

    def batches():
        while True:
            for b in loader:
                b.pop("points", None)
                yield b

    params, n = progressive_distill(
        model, diffusion, teacher, batches(),
        start_steps=args.start_steps,
        end_steps=args.end_steps,
        steps_per_round=args.steps_per_round,
        rng=jax.random.fold_in(rng, 17),
        config=DistillConfig(learning_rate=args.distill_lr),
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_pytree(out / "params", params)
    (out / "manifest.json").write_text(
        json.dumps({"num_steps": n, "start_steps": args.start_steps,
                    "n_timesteps": cfg.diffusion.n_timesteps,
                    "model_family": cfg.unet.family})
    )
    print(f"[distill] saved {out} (sampler budget: {n} DDIM steps)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
