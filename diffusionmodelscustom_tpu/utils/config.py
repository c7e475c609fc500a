"""One typed configuration tree serving YAML, CLI flags, and code.

The reference accumulated four config systems (SURVEY.md section 5.6):
constants-in-script (g2), ~40 argparse flags (g3, test/launch.py:28-69),
an unwired YAML schema marked "NOT WORKING YET" (g3, config.yaml +
update_configuration.py:1-3), and pydantic+click (g4, configs.py:38-180).
This module is the single replacement: dataclass sections matching the
YAML layout (``data / training / unet / diffusion``, config.yaml:3-64),
loadable from YAML, overridable with dotted keys (the broken
``update_configuration.py`` promise, working), and exposed as argparse
flags by the CLI.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple, get_type_hints


@dataclasses.dataclass
class DataConfig:
    """Mirrors config.yaml's ``data`` section + launch.py path flags."""

    hr_var: str = "temp"
    hr_shape: Tuple[int, int] = (64, 64)
    lr_vars: Tuple[str, ...] = ("temp",)
    lr_shape: Tuple[int, int] = (16, 16)
    scaling: bool = True
    in_low: float = -1.0
    in_high: float = 1.0
    data_min: float = -30.0
    data_max: float = 30.0
    path_data: str = "data/"
    path_save: str = "runs/"
    path_checkpoint: str = "model_checkpoints/"
    cutouts: bool = True
    cutout_domains: Tuple[int, int, int, int] = (170, 350, 340, 520)
    cache_size: int = 0
    field_cache_entries: int = 1024  # raw day-field LRU (see DanraDatasetConfig)
    n_gen_samples: int = 4
    num_workers: int = 1
    season_classes: int = 4
    sdf_weighted_loss: bool = False
    # train/valid partition (the reference's data_split_type surface,
    # test/launch.py:59-61): 'none' trains on every member and monitors
    # train loss; 'random'/'temporal' carve a held-out validation set
    # via data/splits.py so early stopping and best-checkpoint selection
    # monitor data the model never trains on
    split_type: str = "none"  # none | random | temporal
    train_size: float = 0.8
    val_size: float = 0.1
    test_size: float = 0.1


@dataclasses.dataclass
class UnetConfig:
    """Model section (launch.py fmap/time/head flags + model family)."""

    family: str = "flagship"  # flagship | danra | danra_ffn
    in_channels: int = 1
    out_channels: int = 1
    base_channels: int = 64
    channel_mults: Tuple[int, ...] = (1, 2, 4)
    first_fmap_channels: int = 64
    last_fmap_channels: int = 512
    time_embedding_size: int = 256
    num_heads: int = 4
    cond_on_img: bool = False
    cond_on_lsm: bool = False
    cond_on_topo: bool = False
    num_classes: Optional[int] = 4
    # flagship attention placement (after down-level i / before up-level
    # i, 1-indexed) — exposed so a checkpoint trained with a non-default
    # placement (e.g. the parity teacher's up=(2, 1)) can be restored
    # and served through the CLI with a matching parameter tree
    attention_levels: Tuple[int, ...] = (1, 2, 3)
    attention_levels_up: Tuple[int, ...] = (2, 1, 0)
    precision: str = "bfloat16"  # compute dtype for the flagship path


@dataclasses.dataclass
class DiffusionConfig:
    """Diffusion section (config.yaml:59-63)."""

    n_timesteps: int = 1000
    beta_min: float = 1e-4
    beta_max: float = 0.02
    beta_scheduler: str = "linear"  # linear | cosine | cosine_ramp
    noise_variance: float = 0.0  # >0 enables the data_scaled 0.005-style path
    cfg_scale: float = 0.0
    # process 'flow' = rectified-flow velocity training (core/flow.py,
    # beyond-reference); requires sampler 'flow'
    process: str = "ddpm"  # ddpm | flow
    sampler: str = "ancestral"  # ancestral | ddim | dpmpp | flow
    ddim_steps: int = 50  # step budget for the few-step samplers
    # sample-time stochastic churn for the ancestral AND ddim samplers
    # (discrete DDPM analogue of EDM S_churn, sampling/ancestral.py);
    # 0 = the exact reference chain. Probed against the Moran's-I parity
    # cells (scripts/probe_churn.py, PARITY.md §3); on the few-step DDIM
    # chain churn 0.1 + clip_denoised is the measured matched-quality
    # serving recipe (DDIM-25+churn0.1 matches the 800-step chain on
    # every held-out metric — docs/FEWSTEP.md, round 5).
    churn: float = 0.0
    # clamp the per-step x0 estimate to [-1, 1] (standard DDPM practice;
    # off by default for exact reference parity — the reference never
    # clips). Load-bearing below ~50 DDIM steps (docs/FEWSTEP.md).
    clip_denoised: bool = False
    # restart re-descent for the ddim sampler (sampling/ancestral.py::
    # ddim_restart_sample, Xu et al. 2023): after the ddim_steps base
    # chain, forward-noise to restart_t and re-descend restart_steps
    # more steps at restart_churn. restart_steps=0 disables. The
    # measured round-5 recipes: 8+4 @ t=200 churn 0.1/0.5 matches the
    # 800-step chain on every held-out metric; 4+2 @ t=150 churn
    # 0.3/0.8 beats its RMSE/FID at six evals (docs/FEWSTEP.md).
    restart_t: int = 0
    restart_steps: int = 0
    restart_churn: float = 0.0
    flow_method: str = "euler"  # euler | heun (flow sampler only)
    flow_time_sampling: str = "uniform"  # uniform | logit_normal
    flow_logit_mean: float = 0.0  # logit_normal time-sampling location
    flow_logit_std: float = 1.0  # logit_normal time-sampling scale


@dataclasses.dataclass
class TrainingConfig:
    """Training section (config.yaml + launch.py optimizer flags)."""

    epochs: int = 100
    batch_size: int = 32
    lr: float = 3e-4
    min_lr: float = 1e-6
    weight_decay: float = 0.01
    optimizer: str = "adamw"
    lr_scheduler: str = "none"  # none | plateau | warmup_cosine
    plateau_patience: int = 5
    plateau_factor: float = 0.5
    warmup_steps: int = 1000
    loss_type: str = "simple"
    hybrid_alpha: float = 0.5
    hybrid_timesteps: Optional[int] = None  # None -> n_timesteps (reference T)
    early_stopping: bool = True
    early_stopping_patience: int = 10
    ema: bool = True
    ema_decay: float = 0.995
    cfg_dropout_prob: float = 0.0
    grad_accum_steps: int = 1
    grad_clip_norm: Optional[float] = None
    seed: int = 0
    n_data_shards: Optional[int] = None  # mesh data axis (None = all devices)
    n_model_shards: int = 1


@dataclasses.dataclass
class ExperimentConfig:
    """Root config: data/training/unet/diffusion (config.yaml layout)."""

    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    unet: UnetConfig = dataclasses.field(default_factory=UnetConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    training: TrainingConfig = dataclasses.field(default_factory=TrainingConfig)
    name: str = "ddpm"

    # -- serialization -----------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExperimentConfig":
        kwargs: Dict[str, Any] = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            value = d[f.name]
            if dataclasses.is_dataclass(f.type) or f.name in (
                "data",
                "unet",
                "diffusion",
                "training",
            ):
                section_cls = {
                    "data": DataConfig,
                    "unet": UnetConfig,
                    "diffusion": DiffusionConfig,
                    "training": TrainingConfig,
                }[f.name]
                value = _section_from_dict(section_cls, value)
            kwargs[f.name] = value
        return cls(**kwargs)

    def save_yaml(self, path) -> None:
        import yaml

        Path(path).write_text(yaml.safe_dump(self.to_dict(), sort_keys=False))

    @classmethod
    def load_yaml(cls, path) -> "ExperimentConfig":
        import yaml

        return cls.from_dict(yaml.safe_load(Path(path).read_text()))

    # -- dotted-key updates (the working update_configuration) -------------

    def update(self, dotted: Dict[str, Any]) -> "ExperimentConfig":
        """Return a copy with dotted-key overrides applied, e.g.
        {'training.lr': 1e-4, 'diffusion.n_timesteps': 800}."""
        d = self.to_dict()
        for key, value in dotted.items():
            parts = key.split(".")
            node = d
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"unknown config section {p!r} in {key!r}")
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(f"unknown config key {key!r}")
            node[parts[-1]] = value
        return type(self).from_dict(d)


def _section_from_dict(section_cls, d: Dict[str, Any]):
    hints = get_type_hints(section_cls)
    kwargs = {}
    for f in dataclasses.fields(section_cls):
        if f.name not in d:
            continue
        v = d[f.name]
        # YAML lists -> tuples where the schema says tuple
        hint = str(hints.get(f.name, ""))
        if isinstance(v, list) and "Tuple" in hint or isinstance(v, list) and "tuple" in hint:
            v = tuple(v)
        kwargs[f.name] = v
    return section_cls(**kwargs)


__all__ = [
    "DataConfig",
    "UnetConfig",
    "DiffusionConfig",
    "TrainingConfig",
    "ExperimentConfig",
]
