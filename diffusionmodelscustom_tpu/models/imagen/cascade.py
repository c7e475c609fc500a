"""Cascaded text-conditional diffusion: the Imagen orchestrator.

Functional rebuild of ``Imagen`` (CascadedDDPM/imagen_pytorch.py:
3312-4594) and ``ElucidatedImagen`` (elucidated_imagen.py:77-939): the
class holds module definitions + per-stage hyperparameters; parameters are
passed explicitly, so training steps and the cascade sampler jit cleanly.

Feature parity:

* per-unet timesteps / noise schedules / prediction objectives
  (imagen_pytorch.py:3397-3423);
* lowres conditioning: previous stage output resized up and *re-noised*
  with an augmentation level, which the SR unet is told about
  (imagen_pytorch.py:3347-3349, 4203-4220);
* classifier-free guidance via per-sample conditioning dropout at train
  time and cond_scale lerp at sample time (imagen_pytorch.py:3716,
  4374-4389);
* dynamic thresholding of x0 estimates (imagen_pytorch.py:3751-3769);
* p_losses with min-SNR-gamma reweighting and noise/x0/v objectives
  (imagen_pytorch.py:4284-4441);
* image [0,1] <-> [-1,1] normalization at the cascade boundary
  (imagen_pytorch.py:499-511);
* elucidated variant: EDM preconditioned forward, log-normal sigma
  training, churn sampling (elucidated_imagen.py).

Inpainting-by-resampling rides the continuous sampler
(sampling/continuous.py); the video pathway uses ImagenUNet3D with
``video=True`` and frame-aware resizing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ...core.continuous import ContinuousDiffusion, dynamic_threshold
from ...core.edm import EDMConfig
from ...core.losses import (
    classifier_free_guidance,
    huber_loss,
    l1_loss,
    simple_loss,
)
from ...ops.resize import resize_image
from ...sampling.edm import edm_sample

_LOSSES = {"l1": l1_loss, "l2": simple_loss, "huber": huber_loss}


def normalize_neg_one_to_one(x):
    """[0,1] -> [-1,1] (imagen_pytorch.py:499-505)."""
    return x * 2.0 - 1.0


def unnormalize_zero_to_one(x):
    """[-1,1] -> [0,1] (imagen_pytorch.py:507-511)."""
    return (x + 1.0) * 0.5


def _cast_per_unet(value, n):
    if isinstance(value, (list, tuple)):
        assert len(value) == n
        return list(value)
    return [value] * n


@dataclasses.dataclass
class Imagen:
    """DDPM-cascade orchestrator (continuous-time noise schedulers)."""

    unets: Sequence[Any]  # ImagenUNet / ImagenUNet3D / NullUnet modules
    image_sizes: Sequence[int]
    channels: int = 3
    video: bool = False  # (B, F, H, W, C) batches through ImagenUNet3D
    video_frames: int = 8
    timesteps: int | Sequence[int] = 1000
    noise_schedules: str | Sequence[str] = "cosine"
    pred_objectives: str | Sequence[str] = "noise"
    loss_type: str = "l2"
    cond_drop_prob: float = 0.1
    lowres_sample_noise_level: float = 0.2
    per_sample_random_aug_noise_level: bool = False
    # random-crop training for SR stages (imagen_pytorch.py:3345,
    # elucidated_imagen.py:118-120): train on aligned crops of the target
    # and its lowres conditioning, sample at full size
    random_crop_sizes: Optional[int | Sequence[Optional[int]]] = None
    dynamic_thresholding: bool | Sequence[bool] = True
    dynamic_thresholding_percentile: float = 0.95
    # min-SNR reweighting gate + gamma (imagen_pytorch.py:3357-3358)
    min_snr_loss_weight: bool = True
    min_snr_gamma: Optional[float] = 5.0
    auto_normalize_img: bool = True
    # cascade-level knob surface parity (imagen_pytorch.py:3312-3360):
    condition_on_text: bool = True
    text_encoder_name: str = "google/t5-v1_1-base"
    text_embed_dim: Optional[int] = None
    # log-SNR schedule for the lowres aug-noise tower (:3347-3349)
    lowres_noise_schedule: str = "linear"
    # resize method for all stage-to-stage resizes (:3356,3483)
    resize_mode: str = "nearest"
    # lock training to one stage (:3359; the trainer enforces its own
    # only_train_unet on top)
    only_train_unet_number: Optional[int] = None
    # per-stage frame-count reduction for video cascades (:3354,3487-3494)
    temporal_downsample_factor: int | Sequence[int] = 1
    resize_cond_video_frames: bool = True

    def __post_init__(self):
        n = len(self.unets)
        assert len(self.image_sizes) == n, "one image size per unet"
        self.timesteps = _cast_per_unet(self.timesteps, n)
        self.noise_schedules = _cast_per_unet(self.noise_schedules, n)
        self.pred_objectives = _cast_per_unet(self.pred_objectives, n)
        self.dynamic_thresholding = _cast_per_unet(self.dynamic_thresholding, n)
        self.random_crop_sizes = _cast_per_unet(self.random_crop_sizes, n)
        self.temporal_downsample_factor = _cast_per_unet(
            self.temporal_downsample_factor, n
        )
        if self.video:
            tdf = self.temporal_downsample_factor
            assert tdf[-1] == 1, (
                "downsample factor of last stage must be 1 "
                "(imagen_pytorch.py:3493)"
            )
            assert tuple(sorted(tdf, reverse=True)) == tuple(tdf), (
                "temporal downsample factors must be descending "
                "(imagen_pytorch.py:3494)"
            )
            for f in tdf:
                assert self.video_frames % f == 0, (
                    f"frames {self.video_frames} must divide factor {f} "
                    "(imagen_pytorch.py:474)"
                )
        self.noise_schedulers = [
            ContinuousDiffusion(noise_schedule=s, num_timesteps=t)
            for s, t in zip(self.noise_schedules, self.timesteps)
        ]
        # lowres aug noise scheduler (imagen_pytorch.py:3347-3349; the
        # reference defaults it to the linear log-SNR schedule)
        self.lowres_scheduler = ContinuousDiffusion(
            noise_schedule=self.lowres_noise_schedule
        )
        # validate the loss name eagerly (p_losses applies it elementwise
        # so per-sample min-SNR weights compose; _LOSSES maps the reduced
        # variants for external callers)
        if self.loss_type not in _LOSSES:
            raise ValueError(
                f"unknown loss_type {self.loss_type!r}; "
                f"options: {'|'.join(_LOSSES)}"
            )
        self.loss_fn = _LOSSES[self.loss_type]

    def _stage_frames(self, unet_index: int) -> int:
        """Frame count generated at a stage (calc_all_frame_dims,
        imagen_pytorch.py:454-477)."""
        return self.video_frames // self.temporal_downsample_factor[unet_index]


    def _random_aligned_crop(self, rng: jax.Array, crop: int, *arrays):
        """Same random crop window applied to every given array (the
        reference crops the target and its lowres cond together,
        imagen_pytorch.py:4337-4350)."""
        ref = arrays[0]
        h, w = ref.shape[-3], ref.shape[-2]
        oy = jax.random.randint(rng, (), 0, h - crop + 1)
        ox = jax.random.randint(jax.random.fold_in(rng, 1), (), 0, w - crop + 1)

        def cut(a):
            if a is None:
                return None
            starts = (0,) * (a.ndim - 3) + (oy, ox, 0)
            sizes = a.shape[: a.ndim - 3] + (crop, crop, a.shape[-1])
            return jax.lax.dynamic_slice(a, starts, sizes)

        return tuple(cut(a) for a in arrays)

    def _resize(self, x, size: int, frames: Optional[int] = None):
        """Frame-aware resize using ``resize_mode`` (imagen_pytorch.py:
        3483): folds the frame axis for video batches (resize_video_to),
        and retimes to ``frames`` when given (scale_video_time)."""
        if x.ndim == 5:
            tgt_f = frames or x.shape[1]
            if x.shape[1] != tgt_f:
                from .unet3d import scale_video_time

                x = scale_video_time(x, tgt_f, method=self.resize_mode)
            b, f = x.shape[:2]
            flat = x.reshape(b * f, *x.shape[2:])
            out = resize_image(flat, size, size, method=self.resize_mode)
            return out.reshape(b, f, *out.shape[1:])
        return resize_image(x, size, size, method=self.resize_mode)

    # -- init ---------------------------------------------------------------

    def init_unet_params(self, unet_index: int, rng: jax.Array, text_embed_dim=None):
        unet = self.unets[unet_index]
        size = self.image_sizes[unet_index]
        b = 2
        if self.video:
            x = jnp.zeros(
                (b, self._stage_frames(unet_index), size, size, self.channels)
            )
        else:
            x = jnp.zeros((b, size, size, self.channels))
        noise_cond = jnp.zeros((b,))
        kwargs = {}
        if text_embed_dim is not None:
            kwargs["text_embeds"] = jnp.zeros((b, 4, text_embed_dim))
            kwargs["text_mask"] = jnp.ones((b, 4), bool)
        if getattr(unet, "lowres_cond", False):
            kwargs["lowres_cond_img"] = jnp.zeros_like(x)
            kwargs["lowres_noise_cond"] = jnp.zeros((b,))
        return unet.init(rng, x, noise_cond, **kwargs)

    # -- training -----------------------------------------------------------

    def p_losses(
        self,
        unet_index: int,
        params,
        images: jnp.ndarray,  # (B, H, W, C) in [0,1] (auto-normalized)
        rng: jax.Array,
        *,
        text_embeds: Optional[jnp.ndarray] = None,
        text_mask: Optional[jnp.ndarray] = None,
        cond_images: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        """Stage loss (imagen_pytorch.py:4284-4441 + forward:4443-4594)."""
        if self.only_train_unet_number is not None:
            assert unet_index == self.only_train_unet_number - 1, (
                f"cascade locked to unet {self.only_train_unet_number} "
                "(imagen_pytorch.py:3359 only_train_unet_number)"
            )
        if not self.condition_on_text:
            text_embeds = text_mask = None
        unet = self.unets[unet_index]
        scheduler = self.noise_schedulers[unet_index]
        objective = self.pred_objectives[unet_index]
        size = self.image_sizes[unet_index]
        b = images.shape[0]
        is_video = self.video and images.ndim == 5
        cur_frames = self._stage_frames(unet_index) if is_video else None
        prev_frames = (
            self._stage_frames(unet_index - 1)
            if is_video and unet_index > 0 and self.resize_cond_video_frames
            else None
        )

        r_t, r_noise, r_drop, r_aug, r_augn = jax.random.split(rng, 5)

        x_start = images
        if self.auto_normalize_img:
            x_start = normalize_neg_one_to_one(x_start)

        # lowres conditioning from the ground truth of the previous stage
        lowres_cond_img = None
        lowres_aug_times = None
        if getattr(unet, "lowres_cond", False):
            prev_size = self.image_sizes[unet_index - 1]
            lowres = self._resize(x_start, prev_size, frames=prev_frames)
            lowres_cond_img = self._resize(lowres, size, frames=cur_frames)
            # augment with noise and tell the unet the level
            # (imagen_pytorch.py:4355-4370)
            if self.per_sample_random_aug_noise_level:
                lowres_aug_times = self.lowres_scheduler.sample_random_times(
                    r_aug, b
                )
            else:
                aug = jax.random.uniform(r_aug, ())
                lowres_aug_times = jnp.full((b,), 1.0) * aug
            lr_noise = jax.random.normal(r_augn, lowres_cond_img.shape)
            lowres_cond_img, *_ = self.lowres_scheduler.q_sample(
                lowres_cond_img, lowres_aug_times, lr_noise
            )

        x_start = self._resize(x_start, size, frames=cur_frames)
        crop = self.random_crop_sizes[unet_index]
        if crop:
            x_start, lowres_cond_img = self._random_aligned_crop(
                jax.random.fold_in(r_aug, 99), crop, x_start, lowres_cond_img
            )
        times = scheduler.sample_random_times(r_t, b)
        noise = jax.random.normal(r_noise, x_start.shape)
        x_noisy, log_snr, alpha, sigma = scheduler.q_sample(x_start, times, noise)

        cond_drop_mask = None
        if train and self.cond_drop_prob > 0 and text_embeds is not None:
            cond_drop_mask = jax.random.bernoulli(r_drop, self.cond_drop_prob, (b,))

        kwargs = dict(
            text_embeds=text_embeds,
            text_mask=text_mask,
            cond_drop_mask=cond_drop_mask,
        )
        if cond_images is not None:
            # the unet resizes cond_images to its input resolution itself
            # (imagen_pytorch.py:2963-2967), so full-size conditioning is
            # correct even for random-crop SR training
            kwargs["cond_images"] = cond_images
        if lowres_cond_img is not None:
            kwargs.update(
                lowres_cond_img=lowres_cond_img,
                lowres_noise_cond=self.lowres_scheduler.get_condition(
                    lowres_aug_times
                ),
            )

        # self-conditioning at p=0.5 (imagen_pytorch.py:4374-4389): one
        # gradient-free forward estimates x0, which conditions the real one
        if getattr(unet, "self_cond", False):
            r_sc, rng = jax.random.split(jax.random.fold_in(rng, 17))
            use_sc = jax.random.bernoulli(r_sc, 0.5)
            pred_free = unet.apply(params, x_noisy, log_snr, **kwargs)
            if objective == "noise":
                x0_est = scheduler.predict_start_from_noise(x_noisy, times, pred_free)
            elif objective == "v":
                x0_est = scheduler.predict_start_from_v(x_noisy, times, pred_free)
            else:
                x0_est = pred_free
            sc = jax.lax.stop_gradient(x0_est) * use_sc.astype(x0_est.dtype)
            kwargs["self_cond"] = sc
        pred = unet.apply(params, x_noisy, log_snr, **kwargs)

        if objective == "noise":
            target = noise
        elif objective == "x_start":
            target = x_start
        elif objective == "v":
            target = scheduler.calculate_v(x_start, times, noise)
        else:
            raise ValueError(f"unknown objective {objective!r}")

        err = (pred.astype(jnp.float32) - target.astype(jnp.float32))
        if self.loss_type == "l1":
            elementwise = jnp.abs(err)
        elif self.loss_type == "huber":
            # smooth-L1 with delta=1 (imagen_pytorch.py loss_type='huber'
            # -> F.smooth_l1_loss); elementwise so min-SNR weights apply
            a = jnp.abs(err)
            quad = jnp.minimum(a, 1.0)
            elementwise = 0.5 * quad * quad + (a - quad)
        else:
            elementwise = err * err
        per_sample = jnp.mean(elementwise, axis=tuple(range(1, err.ndim)))

        # min-SNR-gamma reweighting (imagen_pytorch.py:4416-4438), gated
        # by min_snr_loss_weight (:3357)
        if self.min_snr_loss_weight and self.min_snr_gamma is not None:
            snr = jnp.exp(log_snr)
            clipped = jnp.minimum(snr, self.min_snr_gamma)
            if objective == "noise":
                w = clipped / jnp.clip(snr, 1e-8, None)
            elif objective == "v":
                w = clipped / (snr + 1.0)
            else:
                w = clipped
            per_sample = per_sample * w
        return jnp.mean(per_sample)

    # -- sampling -----------------------------------------------------------

    def _stage_sample(
        self,
        unet_index: int,
        params,
        rng: jax.Array,
        batch: int,
        *,
        text_embeds=None,
        text_mask=None,
        cond_images=None,
        cond_scale: float = 1.0,
        lowres_cond_img=None,
        lowres_noise_cond=None,
        inpaint_images=None,
        inpaint_masks=None,
        inpaint_resample_times: int = 5,
    ) -> jnp.ndarray:
        """One stage's p_sample_loop with CFG + dynamic thresholding."""
        unet = self.unets[unet_index]
        scheduler = self.noise_schedulers[unet_index]
        objective = self.pred_objectives[unet_index]
        use_thresh = self.dynamic_thresholding[unet_index]
        size = self.image_sizes[unet_index]
        if self.video:
            shape = (
                batch, self._stage_frames(unet_index), size, size, self.channels
            )
        else:
            shape = (batch, size, size, self.channels)

        kwargs = dict(text_embeds=text_embeds, text_mask=text_mask)
        if cond_images is not None:
            kwargs["cond_images"] = cond_images
        if lowres_cond_img is not None:
            kwargs.update(
                lowres_cond_img=lowres_cond_img,
                lowres_noise_cond=lowres_noise_cond,
            )

        def model_fn(x, log_snr_cond, t):
            pred = unet.apply(params, x, log_snr_cond, **kwargs)
            if cond_scale != 1.0 and text_embeds is not None:
                drop = jnp.ones((x.shape[0],), bool)
                uncond = unet.apply(
                    params, x, log_snr_cond, cond_drop_mask=drop, **kwargs
                )
                pred = classifier_free_guidance(uncond, pred, cond_scale)
            return pred

        from ...sampling.continuous import p_sample_loop_continuous

        inpaint_kw = {}
        if inpaint_images is not None and inpaint_masks is not None:
            # inpainting operates in normalized space at this stage's size
            ip = inpaint_images
            if self.auto_normalize_img:
                ip = normalize_neg_one_to_one(ip)
            # re-binarize after the float resize (the reference casts
            # .bool(), elucidated_imagen.py:462): hard known-region select
            # .bool() semantics: any nonzero resized weight marks the
            # pixel as known (elucidated_imagen.py:462)
            resized_mask = (
                self._resize(inpaint_masks.astype(jnp.float32), size) > 0.0
            ).astype(jnp.float32)
            inpaint_kw = dict(
                inpaint_images=self._resize(ip, size),
                inpaint_masks=resized_mask,
                resample_times=inpaint_resample_times,
            )
        return p_sample_loop_continuous(
            model_fn,
            scheduler,
            rng,
            shape,
            pred_objective=objective,
            use_dynamic_threshold=bool(use_thresh),
            threshold_percentile=self.dynamic_thresholding_percentile,
            **inpaint_kw,
        )

    def sample(
        self,
        params_list: List[Any],
        rng: jax.Array,
        *,
        batch_size: int = 1,
        text_embeds: Optional[jnp.ndarray] = None,
        text_mask: Optional[jnp.ndarray] = None,
        cond_images: Optional[jnp.ndarray] = None,
        cond_scale: float = 1.0,
        stop_at_unet_number: Optional[int] = None,
        start_image_or_video: Optional[jnp.ndarray] = None,
        start_at_unet_number: int = 1,
        inpaint_images: Optional[jnp.ndarray] = None,
        inpaint_masks: Optional[jnp.ndarray] = None,
        inpaint_resample_times: int = 5,
    ) -> jnp.ndarray:
        """Walk the cascade (imagen_pytorch.py:4007-4280): each stage
        samples at its resolution, conditioning on the previous stage's
        output resized + re-noised at ``lowres_sample_noise_level``."""
        assert (inpaint_images is None) == (inpaint_masks is None), (
            "inpaint_images and inpaint_masks must be given together "
            "(elucidated_imagen.py:613 asserts the same)"
        )
        if not self.condition_on_text:
            text_embeds = text_mask = None
        img = start_image_or_video
        if img is not None and self.auto_normalize_img:
            # user-supplied start images arrive in the same [0,1] space
            # sample() returns; internally stages exchange [-1,1] images,
            # so normalize once at entry (the reference normalizes the
            # resized lowres cond each stage, imagen_pytorch.py:4220)
            img = normalize_neg_one_to_one(img)
        n = len(self.unets)
        for idx in range(start_at_unet_number - 1, n):
            rng, stage_rng, aug_rng = jax.random.split(rng, 3)
            unet = self.unets[idx]
            lowres_cond_img = None
            lowres_noise_cond = None
            if getattr(unet, "lowres_cond", False):
                assert img is not None, "SR stage requires a previous image"
                size = self.image_sizes[idx]
                frames = (
                    self._stage_frames(idx)
                    if self.video and self.resize_cond_video_frames
                    else None
                )
                lowres_cond_img = self._resize(img, size, frames=frames)
                aug_times = jnp.full(
                    (batch_size,), self.lowres_sample_noise_level
                )
                lowres_cond_img, *_ = self.lowres_scheduler.q_sample(
                    lowres_cond_img,
                    aug_times,
                    jax.random.normal(aug_rng, lowres_cond_img.shape),
                )
                lowres_noise_cond = self.lowres_scheduler.get_condition(
                    aug_times
                )
            img = self._stage_sample(
                idx,
                params_list[idx],
                stage_rng,
                batch_size,
                text_embeds=text_embeds,
                text_mask=text_mask,
                cond_images=cond_images,
                cond_scale=cond_scale,
                lowres_cond_img=lowres_cond_img,
                lowres_noise_cond=lowres_noise_cond,
                inpaint_images=inpaint_images,
                inpaint_masks=inpaint_masks,
                inpaint_resample_times=inpaint_resample_times,
            )
            if stop_at_unet_number is not None and idx + 1 >= stop_at_unet_number:
                break
        if self.auto_normalize_img:
            img = unnormalize_zero_to_one(img)
        return img


@dataclasses.dataclass
class ElucidatedImagen(Imagen):
    """EDM cascade variant (elucidated_imagen.py:77-939): same structure,
    Karras-preconditioned unets, log-normal sigma training, churn
    sampling."""

    edm: EDMConfig | Sequence[EDMConfig] = dataclasses.field(
        default_factory=EDMConfig
    )

    def __post_init__(self):
        super().__post_init__()
        self.edm_configs = _cast_per_unet(self.edm, len(self.unets))

    def p_losses(
        self,
        unet_index: int,
        params,
        images: jnp.ndarray,
        rng: jax.Array,
        *,
        text_embeds=None,
        text_mask=None,
        cond_images=None,
        train: bool = True,
    ) -> jnp.ndarray:
        """EDM training loss (elucidated_imagen.py:700-790)."""
        if self.only_train_unet_number is not None:
            assert unet_index == self.only_train_unet_number - 1, (
                f"cascade locked to unet {self.only_train_unet_number} "
                "(imagen_pytorch.py:3359 only_train_unet_number)"
            )
        if not self.condition_on_text:
            text_embeds = text_mask = None
        unet = self.unets[unet_index]
        cfg = self.edm_configs[unet_index]
        size = self.image_sizes[unet_index]
        b = images.shape[0]
        is_video = self.video and images.ndim == 5
        cur_frames = self._stage_frames(unet_index) if is_video else None
        prev_frames = (
            self._stage_frames(unet_index - 1)
            if is_video and unet_index > 0 and self.resize_cond_video_frames
            else None
        )
        r_sigma, r_noise, r_drop, r_aug, r_augn = jax.random.split(rng, 5)

        x_start = images
        if self.auto_normalize_img:
            x_start = normalize_neg_one_to_one(x_start)

        lowres_cond_img = None
        lowres_aug_times = None
        if getattr(unet, "lowres_cond", False):
            prev_size = self.image_sizes[unet_index - 1]
            lowres = self._resize(x_start, prev_size, frames=prev_frames)
            lowres_cond_img = self._resize(lowres, size, frames=cur_frames)
            aug = jax.random.uniform(r_aug, ())
            lowres_aug_times = jnp.full((b,), 1.0) * aug
            lowres_cond_img, *_ = self.lowres_scheduler.q_sample(
                lowres_cond_img,
                lowres_aug_times,
                jax.random.normal(r_augn, lowres_cond_img.shape),
            )

        x_start = self._resize(x_start, size, frames=cur_frames)
        crop = self.random_crop_sizes[unet_index]
        if crop:
            x_start, lowres_cond_img = self._random_aligned_crop(
                jax.random.fold_in(r_aug, 99), crop, x_start, lowres_cond_img
            )
        sigmas = cfg.noise_distribution(r_sigma, b)
        from ...core.schedules import right_pad_dims_to

        padded = right_pad_dims_to(x_start, sigmas)
        noised = x_start + padded * jax.random.normal(r_noise, x_start.shape)

        cond_drop_mask = None
        if train and self.cond_drop_prob > 0 and text_embeds is not None:
            cond_drop_mask = jax.random.bernoulli(r_drop, self.cond_drop_prob, (b,))

        kwargs = dict(
            text_embeds=text_embeds,
            text_mask=text_mask,
            cond_drop_mask=cond_drop_mask,
        )
        if cond_images is not None:
            kwargs["cond_images"] = cond_images
        if lowres_cond_img is not None:
            kwargs.update(
                lowres_cond_img=lowres_cond_img,
                lowres_noise_cond=self.lowres_scheduler.get_condition(
                    lowres_aug_times
                ),
            )

        denoised = cfg.precondition(
            lambda xx, nc: unet.apply(params, xx, nc, **kwargs), noised, sigmas
        )
        err = denoised.astype(jnp.float32) - x_start.astype(jnp.float32)
        per_sample = jnp.mean(err * err, axis=tuple(range(1, err.ndim)))
        return jnp.mean(per_sample * cfg.loss_weight(sigmas))

    def _stage_sample(
        self,
        unet_index: int,
        params,
        rng: jax.Array,
        batch: int,
        *,
        text_embeds=None,
        text_mask=None,
        cond_images=None,
        cond_scale: float = 1.0,
        lowres_cond_img=None,
        lowres_noise_cond=None,
        inpaint_images=None,
        inpaint_masks=None,
        inpaint_resample_times: int = 5,
    ) -> jnp.ndarray:
        unet = self.unets[unet_index]
        cfg = self.edm_configs[unet_index]
        size = self.image_sizes[unet_index]
        if self.video:
            shape = (
                batch, self._stage_frames(unet_index), size, size, self.channels
            )
        else:
            shape = (batch, size, size, self.channels)
        use_thresh = self.dynamic_thresholding[unet_index]

        kwargs = dict(text_embeds=text_embeds, text_mask=text_mask)
        if cond_images is not None:
            kwargs["cond_images"] = cond_images
        if lowres_cond_img is not None:
            kwargs.update(
                lowres_cond_img=lowres_cond_img,
                lowres_noise_cond=lowres_noise_cond,
            )

        def denoise_fn(x, sigma_b):
            def net(xx, nc):
                pred = unet.apply(params, xx, nc, **kwargs)
                if cond_scale != 1.0 and text_embeds is not None:
                    drop = jnp.ones((xx.shape[0],), bool)
                    uncond = unet.apply(
                        params, xx, nc, cond_drop_mask=drop, **kwargs
                    )
                    pred = classifier_free_guidance(uncond, pred, cond_scale)
                return pred

            out = cfg.precondition(net, x, sigma_b)
            if use_thresh:
                out = dynamic_threshold(out, self.dynamic_thresholding_percentile)
            else:
                out = jnp.clip(out, -1.0, 1.0)
            return out

        # EDM inpainting-by-resampling (elucidated_imagen.py:455-463):
        # normalize + resize the known image/mask into model space at this
        # stage's resolution, then repaint inside the churn scan.
        inpaint_kw = {}
        if inpaint_images is not None and inpaint_masks is not None:
            ip = inpaint_images
            if self.auto_normalize_img:
                ip = normalize_neg_one_to_one(ip)
            # .bool() semantics: any nonzero resized weight marks the
            # pixel as known (elucidated_imagen.py:462)
            resized_mask = (
                self._resize(inpaint_masks.astype(jnp.float32), size) > 0.0
            ).astype(jnp.float32)
            inpaint_kw = dict(
                inpaint_images=self._resize(ip, size),
                inpaint_masks=resized_mask,
                resample_times=inpaint_resample_times,
            )

        return edm_sample(denoise_fn, cfg, rng, shape, clamp=True, **inpaint_kw)


__all__ = [
    "Imagen",
    "ElucidatedImagen",
    "normalize_neg_one_to_one",
    "unnormalize_zero_to_one",
]
