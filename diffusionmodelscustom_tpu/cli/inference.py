"""Shared checkpoint-loading for the inference CLIs (generate / serve).

One implementation of the restore → EMA-select → distilled-student →
int8-mode sequence so the sampling entry points cannot drift (they did:
the review caught generate warning on a missing checkpoint while serve
did not, and both building restore templates whose optimizer-state tree
could not match a non-default training run)."""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Optional, Tuple


def load_inference_setup(
    cfg,
    args,
    model,
    diffusion,
    loader,
) -> Tuple[object, dict, Optional[dict], str, int]:
    """Returns (model, params, batch_stats, sampler_name, steps).

    - restores the best (else latest) training checkpoint with a restore
      template whose optimizer tree mirrors the training run's
      (cli.train.trainer_config_from_experiment);
    - honors ``args.use_ema`` (EMA params when present);
    - ``args.distilled``: loads a cli.distill student and pins the DDIM
      budget from its manifest;
    - ``args.conv_quant``: clones the model with dynamic-int8 convs.
    """
    import jax

    from ..train import Trainer
    from ..utils.checkpoint import CheckpointManager, restore_pytree
    from .train import trainer_config_from_experiment

    # steps_per_epoch only affects scheduler VALUES, never the optimizer
    # state's tree structure, so 1 is fine for a restore template
    trainer = Trainer(
        model, diffusion, trainer_config_from_experiment(cfg, 1)
    )
    example = next(iter(loader))
    example.pop("points", None)
    state = trainer.init_state(jax.random.key(cfg.training.seed), example)

    ckpt_dir = Path(cfg.data.path_save) / cfg.data.path_checkpoint
    restored = False
    if ckpt_dir.exists():
        mgr = CheckpointManager(ckpt_dir, best_mode="min")
        # explicit None check: a best step of 0 (first epoch) is falsy
        step = mgr.best_step()
        if step is None:
            step = mgr.latest_step()
        if step is not None:
            state = mgr.restore(state, step=step)
            print(f"[inference] restored checkpoint step {step}",
                  file=sys.stderr)
            restored = True
        mgr.close()
    if not restored:
        print("[inference] WARNING: no checkpoint found, using random init",
              file=sys.stderr)

    use_ema = getattr(args, "use_ema", True)
    params = (
        state.ema_params
        if (use_ema and state.ema_params is not None)
        else state.params
    )
    batch_stats = state.batch_stats

    sampler_name = cfg.diffusion.sampler
    steps = cfg.diffusion.ddim_steps
    if getattr(args, "distilled", None):
        ddir = Path(args.distilled)
        manifest = json.loads((ddir / "manifest.json").read_text())
        params = restore_pytree(ddir / "params", params)
        sampler_name, steps = "ddim", int(manifest["num_steps"])
        print(f"[inference] distilled student: ddim {steps} steps",
              file=sys.stderr)
    # a flow-trained model predicts velocity, a DDPM one predicts noise —
    # mixing the process and sampler families silently generates garbage,
    # so refuse up front (this also rejects --distilled with a flow
    # process: the distillation pipeline is eps-objective DDIM)
    if (cfg.diffusion.process == "flow") != (sampler_name == "flow"):
        raise SystemExit(
            f"diffusion.process={cfg.diffusion.process!r} is incompatible "
            f"with sampler {sampler_name!r}: process 'flow' requires "
            "sampler 'flow' (and only then)"
        )
    if getattr(args, "conv_quant", False):
        if not hasattr(model, "conv_quant"):
            raise SystemExit("--conv_quant requires the flagship model family")
        model = model.clone(
            conv_quant=True,
            attn_pv_int8=getattr(args, "attn_pv_int8", False),
        )

    return model, params, batch_stats, sampler_name, steps


__all__ = ["load_inference_setup"]
