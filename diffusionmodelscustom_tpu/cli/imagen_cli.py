"""Imagen cascade CLI — rebuild of the reference click CLI + pydantic
configs (CascadedDDPM/cli.py:24-179, configs.py:38-180).

Commands:

* ``imagen config [--path imagen_config.json]`` — emit the default JSON
  config (cli.py:63-72);
* ``imagen train --config CFG --unet N`` — train one cascade stage from
  a config-described dataset (cli.py:75-179; here the dataset is a local
  image store or synthetic data, since the LAION streaming pipeline needs
  network access);
* ``imagen sample --model CKPT "text prompt"`` — load a checkpoint and
  sample the cascade (cli.py:28-61).

Config schema mirrors default_config.json's keys (type/imagen/unets/
trainer/dataset/checkpoint_path) validated with pydantic.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, List, Optional, Union

import click
import numpy as np
from pydantic import BaseModel, ConfigDict, field_validator


class UnetConfig(BaseModel):
    """One cascade stage (configs.py:38-66 surface).

    Accepts the FULL reference Unet knob surface
    (imagen_pytorch.py:2349-2398): the common knobs are typed below;
    every other reference kwarg (num_time_tokens, layer_attns_depth,
    attend_at_middle, init_dim, resize_mode, ...) is accepted as an extra
    key and resolved by ``imagen_unet_from_ref_config`` — an unknown knob
    fails at build time with a TypeError rather than being silently
    dropped."""

    model_config = ConfigDict(extra="allow")

    # NullUnet placeholder stage (configs.py:38-41 NullUnetConfig): skips
    # an already-trained cascade slot
    is_null: bool = False
    dim: int = 128
    dim_mults: List[int] = [1, 2, 4]
    channels: int = 3
    num_resnet_blocks: Union[int, List[int]] = 2
    layer_attns: Union[bool, List[bool]] = True
    layer_cross_attns: Union[bool, List[bool]] = True
    attn_heads: int = 8
    # round-2 breadth knobs (imagen_pytorch.py Unet kwargs)
    use_linear_attn: Union[bool, List[bool]] = False
    use_linear_cross_attn: Union[bool, List[bool]] = False
    cosine_sim_attn: bool = False
    scale_skip_connection: bool = True  # reference default (:2390)
    combine_upsample_fmaps: bool = False
    memory_efficient: bool = False
    use_global_context: bool = False
    pixel_shuffle_upsample: bool = True
    self_cond: bool = False
    cond_images_channels: int = 0


class ImagenConfigSchema(BaseModel):
    """configs.py:67-130 surface."""

    video: bool = False
    video_frames: int = 8
    elucidated: bool = False
    timesteps: Union[int, List[int]] = 1000
    image_sizes: List[int] = [64, 256]
    random_crop_sizes: Optional[List[Optional[int]]] = None
    condition_on_text: bool = True
    cond_drop_prob: float = 0.1
    text_encoder_name: str = "google/t5-v1_1-base"
    noise_schedules: Union[str, List[str]] = "cosine"
    pred_objectives: Union[str, List[str]] = "noise"
    # cascade-level reference knobs (imagen_pytorch.py:3312-3360)
    loss_type: str = "l2"
    lowres_sample_noise_level: float = 0.2
    per_sample_random_aug_noise_level: bool = False
    lowres_noise_schedule: str = "linear"
    dynamic_thresholding: Union[bool, List[bool]] = True
    dynamic_thresholding_percentile: float = 0.95
    min_snr_loss_weight: bool = True
    min_snr_gamma: Optional[float] = 5.0
    auto_normalize_img: bool = True
    resize_mode: str = "nearest"
    only_train_unet_number: Optional[int] = None
    temporal_downsample_factor: Union[int, List[int]] = 1
    resize_cond_video_frames: bool = True
    # elucidated (EDM) per-unet hyperparameters
    # (configs.py:108-128 ElucidatedImagenConfig surface)
    num_sample_steps: Union[int, List[int]] = 32
    sigma_min: Union[float, List[float]] = 0.002
    sigma_max: Union[float, List[float]] = 80.0
    sigma_data: Union[float, List[float]] = 0.5
    rho: Union[float, List[float]] = 7.0
    P_mean: Union[float, List[float]] = -1.2
    P_std: Union[float, List[float]] = 1.2
    S_churn: Union[float, List[float]] = 80.0
    S_tmin: Union[float, List[float]] = 0.05
    S_tmax: Union[float, List[float]] = 50.0
    S_noise: Union[float, List[float]] = 1.003
    # default: a base-64 + SR-256 two-stage cascade (the reference default
    # is a 3-stage 64->256->1024, default_config.json:5-44)
    unets: List[UnetConfig] = [
        UnetConfig(dim=128, dim_mults=[1, 2, 3], num_resnet_blocks=2),
        UnetConfig(dim=64, dim_mults=[1, 2, 4],
                   num_resnet_blocks=[2, 4, 4],
                   layer_attns=[False, False, True],
                   layer_cross_attns=[False, False, True]),
    ]

    @field_validator("image_sizes")
    @classmethod
    def _sizes_match(cls, v):
        assert len(v) >= 1
        return v


class TrainerConfigSchema(BaseModel):
    """ImagenTrainerConfig surface (configs.py:158-170)."""

    lr: float = 1e-4
    eps: float = 1e-8
    beta1: float = 0.9
    beta2: float = 0.99
    use_ema: bool = True
    max_grad_norm: Optional[float] = None
    warmup_steps: Optional[int] = None
    cosine_decay_max_steps: Optional[int] = None
    # accepted for config compatibility; our AdamW path applies no weight
    # decay so there is nothing to group (configs.py:168 group_wd_params)
    group_wd_params: bool = True
    checkpoint_every: Optional[int] = None
    max_checkpoints_keep: int = 3
    only_train_unet: Optional[int] = None


class RootConfig(BaseModel):
    """default_config.json layout."""

    type: str = "original"  # original | elucidated (configs dispatch)
    imagen: ImagenConfigSchema = ImagenConfigSchema()
    trainer: TrainerConfigSchema = TrainerConfigSchema()
    dataset_name: Optional[str] = None
    dataset: dict = {"batch_size": 8, "shuffle": True}
    checkpoint_path: str = "./imagen_ckpt"


def _build_cascade(cfg: RootConfig):
    from ..models.imagen import ElucidatedImagen, Imagen
    from ..models.imagen.t5 import get_encoded_dim
    from ..models.imagen.unet import imagen_unet_from_ref_config

    text_dim = get_encoded_dim(cfg.imagen.text_encoder_name)

    def build_unet(i, u):
        if u.is_null:
            # placeholder for an already-trained stage (NullUnetConfig,
            # configs.py:38-41; imagen_pytorch.py:3193 NullUnet)
            from ..models.imagen import NullUnet

            return NullUnet()
        knobs = u.model_dump()
        knobs.pop("is_null", None)
        if cfg.imagen.video:
            # video cascade dispatches Unet3D stages (configs.py video
            # flag; imagen_video.py Unet3D). Only explicitly-set unet keys
            # are forwarded so 2-D-only schema defaults don't leak in.
            from ..models.imagen.unet3d import unet3d_from_ref_config

            knobs = u.model_dump(exclude_unset=True)
            knobs.pop("is_null", None)
            return unet3d_from_ref_config(
                knobs, text_embed_dim=text_dim, lowres_cond=i > 0
            )
        return imagen_unet_from_ref_config(
            knobs, text_embed_dim=text_dim, lowres_cond=i > 0
        )

    unets = [build_unet(i, u) for i, u in enumerate(cfg.imagen.unets)]
    elucidated = cfg.type == "elucidated" or cfg.imagen.elucidated
    cls = ElucidatedImagen if elucidated else Imagen
    im = cfg.imagen
    extra = {}
    if elucidated:
        from ..core import EDMConfig

        n = len(im.unets)

        def per(v, i):
            if isinstance(v, list):
                if len(v) != n:
                    raise ValueError(
                        f"per-unet EDM list has {len(v)} entries but the "
                        f"config defines {n} unets — lists must match"
                    )
                return v[i]
            return v

        extra["edm"] = [
            EDMConfig(
                num_sample_steps=per(im.num_sample_steps, i),
                sigma_min=per(im.sigma_min, i),
                sigma_max=per(im.sigma_max, i),
                sigma_data=per(im.sigma_data, i),
                rho=per(im.rho, i),
                P_mean=per(im.P_mean, i),
                P_std=per(im.P_std, i),
                S_churn=per(im.S_churn, i),
                S_tmin=per(im.S_tmin, i),
                S_tmax=per(im.S_tmax, i),
                S_noise=per(im.S_noise, i),
            )
            for i in range(n)
        ]
    return cls(
        unets=unets,
        **extra,
        image_sizes=tuple(im.image_sizes),
        channels=im.unets[0].channels,
        video=im.video,
        video_frames=im.video_frames,
        timesteps=im.timesteps,
        noise_schedules=im.noise_schedules,
        pred_objectives=im.pred_objectives,
        loss_type=im.loss_type,
        cond_drop_prob=im.cond_drop_prob,
        random_crop_sizes=im.random_crop_sizes,
        condition_on_text=im.condition_on_text,
        text_encoder_name=im.text_encoder_name,
        text_embed_dim=text_dim,
        lowres_sample_noise_level=im.lowres_sample_noise_level,
        per_sample_random_aug_noise_level=im.per_sample_random_aug_noise_level,
        lowres_noise_schedule=im.lowres_noise_schedule,
        dynamic_thresholding=im.dynamic_thresholding,
        dynamic_thresholding_percentile=im.dynamic_thresholding_percentile,
        min_snr_loss_weight=im.min_snr_loss_weight,
        min_snr_gamma=im.min_snr_gamma,
        auto_normalize_img=im.auto_normalize_img,
        resize_mode=im.resize_mode,
        only_train_unet_number=im.only_train_unet_number,
        temporal_downsample_factor=im.temporal_downsample_factor,
        resize_cond_video_frames=im.resize_cond_video_frames,
    ), text_dim


def _apply_platform(platform, n_virtual_devices=0):
    """Pin a JAX platform before the first operation (mirrors
    cli/train.py:apply_platform). The environment may register a remote
    TPU plugin in every process; ``--platform cpu`` keeps smoke runs off
    the (single, shared) chip."""
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        if n_virtual_devices:
            jax.config.update("jax_num_cpu_devices", n_virtual_devices)


_platform_option = click.option(
    "--platform", default=None, type=click.Choice(["cpu", "tpu"]),
    help="force a JAX platform (cpu useful for smoke runs)",
)


@click.group()
def imagen():
    """TPU-native Imagen cascade."""


@imagen.command(help="emit the default config json")
@click.option("--path", default="./imagen_config.json")
def config(path):
    Path(path).write_text(RootConfig().model_dump_json(indent=2))
    click.echo(f"config written to {path}")


@imagen.command(help="train one cascade stage")
@click.option("--config", "config_path", required=True)
@click.option("--unet", "unet_number", default=1, type=int)
@click.option("--steps", default=100, type=int)
@click.option("--synthetic", is_flag=True, help="use synthetic image data")
@click.option("--data_dir", default=None, help="directory of training .npy images")
@_platform_option
def train(config_path, unet_number, steps, synthetic, data_dir, platform):
    _apply_platform(platform)
    import jax

    from ..models.imagen.t5 import t5_encode_text
    from ..train.imagen_trainer import ImagenTrainer, ImagenTrainerConfig
    from ..utils.checkpoint import save_pytree

    cfg = RootConfig(**json.loads(Path(config_path).read_text()))
    cascade, text_dim = _build_cascade(cfg)
    trainer = ImagenTrainer(
        cascade,
        ImagenTrainerConfig(
            learning_rate=cfg.trainer.lr,
            eps=cfg.trainer.eps,
            beta1=cfg.trainer.beta1,
            beta2=cfg.trainer.beta2,
            use_ema=cfg.trainer.use_ema,
            max_grad_norm=cfg.trainer.max_grad_norm,
            warmup_steps=cfg.trainer.warmup_steps,
            cosine_decay_max_steps=cfg.trainer.cosine_decay_max_steps,
            checkpoint_every=cfg.trainer.checkpoint_every,
            # periodic checkpointing + auto-resume need the folder too
            # (imagen_trainer.py requires BOTH checkpoint_every and
            # checkpoint_path)
            checkpoint_path=cfg.checkpoint_path,
            max_checkpoints_keep=cfg.trainer.max_checkpoints_keep,
            only_train_unet=cfg.trainer.only_train_unet,
        ),
        text_embed_dim=text_dim,
    )
    batch_size = int(cfg.dataset.get("batch_size", 8))
    size = cfg.imagen.image_sizes[unet_number - 1]
    channels = cfg.imagen.unets[0].channels
    rng = jax.random.key(0)

    if synthetic or data_dir is None:
        shape = (
            (batch_size, cfg.imagen.video_frames, size, size, channels)
            if cfg.imagen.video
            else (batch_size, size, size, channels)
        )
        images = np.random.default_rng(0).uniform(size=shape).astype(np.float32)
        captions = [f"synthetic sample {i}" for i in range(batch_size)]
    else:
        files = sorted(Path(data_dir).glob("*.npy"))[:batch_size]
        images = np.stack([np.load(f) for f in files])
        captions = [f.stem.replace("_", " ") for f in files]
    embeds, mask = t5_encode_text(captions, name=cfg.imagen.text_encoder_name)

    import jax.numpy as jnp

    images_j = jnp.asarray(images)
    embeds_j = jnp.asarray(embeds)
    mask_j = jnp.asarray(mask)
    for i in range(steps):
        loss = trainer.train_step(
            unet_number,
            images_j,
            text_embeds=embeds_j,
            text_mask=mask_j,
            rng=jax.random.fold_in(rng, i),
        )
        if i % 10 == 0:
            click.echo(f"step {i}: loss {loss:.5f}")
    save_pytree(Path(cfg.checkpoint_path) / f"unet{unet_number}", trainer.states[unet_number - 1])
    click.echo(f"saved {cfg.checkpoint_path}/unet{unet_number}")


@imagen.command(help="sample images from a config + checkpoints")
@click.option("--config", "config_path", required=True)
@click.option("--output", default="./imagen_sample.npz")
@click.option("--batch_size", default=1, type=int)
@click.option("--cond_scale", default=5.0, type=float)
@_platform_option
@click.argument("text")
def sample(config_path, output, batch_size, cond_scale, text, platform):
    _apply_platform(platform)
    import jax
    import jax.numpy as jnp

    from ..models.imagen.t5 import t5_encode_text
    from ..train.imagen_trainer import ImagenTrainer, ImagenTrainerConfig
    from ..utils.checkpoint import restore_pytree

    cfg = RootConfig(**json.loads(Path(config_path).read_text()))
    cascade, text_dim = _build_cascade(cfg)
    trainer = ImagenTrainer(
        cascade, ImagenTrainerConfig(learning_rate=cfg.trainer.lr),
        text_embed_dim=text_dim,
    )
    rng = jax.random.key(0)
    for i in range(trainer.num_unets):
        state = trainer.init_unet(i + 1, jax.random.fold_in(rng, i))
        path = Path(cfg.checkpoint_path) / f"unet{i + 1}"
        if path.exists():
            trainer.states[i] = restore_pytree(
                path, jax.tree_util.tree_map(jnp.zeros_like, state)
            )
            click.echo(f"restored {path}")
    embeds, mask = t5_encode_text([text] * batch_size, name=cfg.imagen.text_encoder_name)
    out = trainer.sample(
        rng,
        batch_size=batch_size,
        text_embeds=jnp.asarray(embeds),
        text_mask=jnp.asarray(mask),
        cond_scale=cond_scale,
    )
    np.savez_compressed(output, data=np.asarray(out))
    click.echo(f"wrote {output} shape={tuple(out.shape)}")


def main(argv=None):
    return imagen(args=argv, standalone_mode=True)


if __name__ == "__main__":
    main()
