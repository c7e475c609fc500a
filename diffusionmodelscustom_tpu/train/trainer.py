"""Unified Trainer — one config-driven pipeline replacing the reference's
five near-duplicate TrainingPipeline classes
(training_DANRA_conditional.py:58-1354) and the clean app's copy
(src/training.py:13-288).

Feature parity:

* loss registry: simple / hybrid / sdfweighted (+l1/huber for cascade)
  selected by name (ddpm_DANRA_conditional_wValid.py:375-414);
* mixed precision: bf16 compute with f32 params/loss — the TPU-native
  equivalent of CUDA-AMP GradScaler/autocast
  (training_DANRA_conditional.py:795-798,963-984; loss scaling is
  unnecessary in bf16 because it shares f32's exponent range);
* EMA of parameters (ImagenTrainer, CascadedDDPM/trainer.py:402-446);
* classifier-free-guidance dropout of conditioning during training
  (prob_mask_like in the cascade, imagen_pytorch.py:525; null-cond
  design documented in models/danra_unet.py);
* validation loop, best-checkpoint tracking and early stopping on
  patience (src/main_ddpm.py:458-472);
* gradient accumulation (the reference's max_batch_size chunking,
  CascadedDDPM/trainer.py:1042-1066) via ``optax.MultiSteps``.

TPU-first: ``train_step`` is a single donated jit; under a mesh the batch
is sharded on the ``data`` axis and XLA emits the gradient all-reduce —
there is no explicit DDP/NCCL layer to port (SURVEY.md section 2.4 P1).
Because jit sees the *global* batch, BatchNorm statistics in the DANRA
encoder are computed over all shards — sync-BN semantics by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.ddpm import GaussianDiffusion
from ..core.losses import sdf_weighted_mse, simple_loss, l1_loss, huber_loss
from .optim import make_optimizer
from .state import TrainState

Batch = Dict[str, jnp.ndarray]


@dataclasses.dataclass
class TrainerConfig:
    """Knobs mirroring the reference's hyperparameter surface
    (ddpm_DANRA_conditional_wValid.py:198-212; test/launch.py:28-69)."""

    loss: str = "simple"  # simple | sdfweighted | hybrid | l1 | huber
    optimizer: str = "adamw"
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    grad_clip_norm: Optional[float] = None
    grad_accum_steps: int = 1
    # LR scheduling (src/main_ddpm.py:376-409 scheduler selection;
    # ReduceLROnPlateau stepped on train loss, ddpm…wValid.py:417,679;
    # ImagenTrainer warmup+cosine, CascadedDDPM/trainer.py:427-446)
    lr_scheduler: str = "none"  # none | plateau | warmup_cosine
    plateau_patience: int = 5
    plateau_factor: float = 0.5
    plateau_accumulation: int = 1  # set to steps-per-epoch for epoch patience
    min_lr_ratio: float = 0.0
    warmup_steps: int = 1000
    total_steps: Optional[int] = None  # required for warmup_cosine
    # hybrid loss (HybridLoss(alpha=0.5, T=n_timesteps),
    # ddpm_DANRA_conditional_wValid.py:378); None -> diffusion.n_timesteps
    hybrid_alpha: float = 0.5
    hybrid_timesteps: Optional[int] = None
    ema: bool = True
    ema_decay: float = 0.995
    cfg_dropout_prob: float = 0.0  # p(uncond) during training
    min_sea_weight: float = 0.5
    max_land_weight: float = 1.0
    early_stopping_patience: Optional[int] = None
    num_classes: Optional[int] = None  # for CFG null-label substitution
    log_grad_norm: bool = False  # extra all-reduce per step when enabled


class Trainer:
    """Config-driven training/validation orchestrator.

    ``model`` is a linen module with the black-box signature
    model(x, t, y, cond_img, lsm_cond, topo_cond, train=) -> eps_hat.
    Batches are dicts with the reference's key names
    ('img', 'classifier', 'img_cond', 'lsm', 'topo', 'sdf' — see
    data_DANRA_conditional.py:1177-1228); missing keys mean that
    conditioning is unused.
    """

    def __init__(
        self,
        model,
        diffusion: GaussianDiffusion,
        config: TrainerConfig = TrainerConfig(),
        batch_finisher=None,
    ):
        self.model = model
        self.diffusion = diffusion
        self.config = config
        # jit-traceable transform applied to every incoming batch inside
        # the compiled step (e.g. data.device_feed.DeviceGeoFinisher:
        # batches arrive as packed uint16 buffers and the geography
        # channels are reconstructed on device). None -> batches are the
        # usual dicts.
        self._batch_finisher = batch_finisher
        if config.loss not in ("simple", "mse", "l1", "huber",
                               "sdfweighted", "hybrid"):
            raise ValueError(
                f"unknown loss {config.loss!r}; "
                "options: simple|mse|l1|huber|sdfweighted|hybrid"
            )
        schedule = None
        plateau_patience = None
        if config.lr_scheduler == "warmup_cosine":
            if config.total_steps is None:
                raise ValueError(
                    "lr_scheduler='warmup_cosine' requires total_steps"
                )
            from .optim import warmup_cosine_schedule

            schedule = warmup_cosine_schedule(
                config.learning_rate,
                config.warmup_steps,
                config.total_steps,
                end_lr_ratio=config.min_lr_ratio,
            )
        elif config.lr_scheduler == "plateau":
            plateau_patience = config.plateau_patience
        elif config.lr_scheduler not in ("none", None):
            raise ValueError(
                f"unknown lr_scheduler {config.lr_scheduler!r}; "
                "options: none|plateau|warmup_cosine"
            )
        # plateau scaling consumes the scalar loss each step (value= kwarg
        # through TrainState.apply_gradients)
        self._pass_loss_value = plateau_patience is not None
        tx = make_optimizer(
            config.optimizer,
            config.learning_rate,
            weight_decay=config.weight_decay,
            grad_clip_norm=config.grad_clip_norm,
            schedule=schedule,
            plateau_patience=plateau_patience,
            plateau_factor=config.plateau_factor,
            plateau_accumulation=config.plateau_accumulation,
            plateau_min_scale=config.min_lr_ratio,
        )
        if config.grad_accum_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum_steps)
        self.tx = tx
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_scan = jax.jit(self._train_scan_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # -- state ---------------------------------------------------------------

    def init_state(self, rng: jax.Array, example_batch: Batch) -> TrainState:
        x = example_batch["img"]
        t = jnp.zeros((x.shape[0],), jnp.int32)
        variables = self.model.init(
            rng,
            x,
            t,
            example_batch.get("classifier"),
            example_batch.get("img_cond"),
            example_batch.get("lsm"),
            example_batch.get("topo"),
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        return TrainState.create(
            apply_fn=self.model.apply,
            params=params,
            tx=self.tx,
            batch_stats=batch_stats,
            use_ema=self.config.ema,
            ema_decay=self.config.ema_decay,
        )

    # -- loss ----------------------------------------------------------------

    def _compute_loss(self, pred, target, batch: Batch) -> jnp.ndarray:
        name = self.config.loss
        if name == "sdfweighted":
            return sdf_weighted_mse(
                pred,
                target,
                batch["sdf"],
                self.config.max_land_weight,
                self.config.min_sea_weight,
            )
        if name == "l1":
            return l1_loss(pred, target)
        if name == "huber":
            return huber_loss(pred, target)
        if name in ("simple", "mse"):
            return simple_loss(pred, target)
        raise ValueError(
            f"unknown loss {name!r}; options: simple|mse|l1|huber|sdfweighted|hybrid"
        )

    def _hybrid_loss(self, params, batch_stats, batch: Batch, x_t, rng):
        """HybridLoss semantics (training_DANRA_conditional.py:18-31,190-199):
        the model is evaluated on the SAME noised batch x_t at every
        timestep k in [0, T), each prediction scored against an independent
        noise draw; the final-timestep term has weight 1, all earlier terms
        weight alpha. The reference realizes this with T sequential python
        forwards building a [T, B, ...] stack; here a ``lax.scan`` with a
        rematerialized body keeps memory O(1) in T on TPU while the gradient
        still flows through all T forwards.
        """
        T = self.config.hybrid_timesteps or self.diffusion.n_timesteps
        alpha = self.config.hybrid_alpha
        b = x_t.shape[0]

        def body(acc, inputs):
            k, key = inputs
            pred, _ = self._forward(
                params, batch_stats, batch, x_t, jnp.full((b,), k), train=False
            )
            noise_k = jax.random.normal(key, x_t.shape, jnp.float32)
            mse = simple_loss(pred, noise_k)
            w = jnp.where(k == T - 1, 1.0, alpha)
            return acc + w * mse, None

        keys = jax.random.split(rng, T)
        ks = jnp.arange(T)
        total, _ = jax.lax.scan(
            jax.checkpoint(body), jnp.zeros((), jnp.float32), (ks, keys)
        )
        return total

    def _apply_cfg_dropout(self, rng: jax.Array, batch: Batch) -> Batch:
        """Per-sample conditioning dropout for CFG training.

        Replaces labels with the null class and zeroes cond channels with
        probability ``cfg_dropout_prob`` (the cascade's cond_drop_prob /
        prob_mask_like recipe, imagen_pytorch.py:525,2960-3010)."""
        p = self.config.cfg_dropout_prob
        if p <= 0.0:
            return batch
        b = batch["img"].shape[0]
        drop = jax.random.bernoulli(rng, p, (b,))
        out = dict(batch)
        if "classifier" in batch and self.config.num_classes is not None:
            out["classifier"] = jnp.where(
                drop, jnp.full_like(batch["classifier"], self.config.num_classes),
                batch["classifier"],
            )
        for key in ("img_cond", "lsm", "topo"):
            if key in batch:
                mask = (~drop).astype(batch[key].dtype).reshape(
                    (b,) + (1,) * (batch[key].ndim - 1)
                )
                out[key] = batch[key] * mask
        return out

    # -- steps ---------------------------------------------------------------

    def _forward(self, params, batch_stats, batch: Batch, x_t, t, train: bool):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        kwargs = dict(
            y=batch.get("classifier"),
            cond_img=batch.get("img_cond"),
            lsm_cond=batch.get("lsm"),
            topo_cond=batch.get("topo"),
            train=train,
        )
        if train and batch_stats is not None:
            pred, updates = self.model.apply(
                variables, x_t, t, mutable=["batch_stats"], **kwargs
            )
            return pred, updates["batch_stats"]
        pred = self.model.apply(variables, x_t, t, **kwargs)
        return pred, batch_stats

    def _train_step_impl(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if self._batch_finisher is not None:
            batch = self._batch_finisher(batch)
        rng_t, rng_noise, rng_cfg = jax.random.split(rng, 3)
        batch = self._apply_cfg_dropout(rng_cfg, batch)
        x0 = batch["img"]
        t = self.diffusion.sample_timesteps(rng_t, x0.shape[0])
        x_t, noise = self.diffusion.noise_image(rng_noise, x0, t)

        if self.config.loss == "hybrid":
            rng_h = jax.random.fold_in(rng, 7)

            def loss_fn(params):
                loss = self._hybrid_loss(
                    params, state.batch_stats, batch, x_t, rng_h
                )
                return loss, state.batch_stats

        else:

            def loss_fn(params):
                pred, new_stats = self._forward(
                    params, state.batch_stats, batch, x_t, t, train=True
                )
                loss = self._compute_loss(pred, noise, batch)
                return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(
            grads=grads,
            batch_stats=new_stats,
            value=loss if self._pass_loss_value else None,
        )
        metrics = {"loss": loss}
        if self.config.log_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def _eval_step_impl(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> jnp.ndarray:
        if self._batch_finisher is not None:
            batch = self._batch_finisher(batch)
        rng_t, rng_noise = jax.random.split(rng)
        x0 = batch["img"]
        t = self.diffusion.sample_timesteps(rng_t, x0.shape[0])
        x_t, noise = self.diffusion.noise_image(rng_noise, x0, t)
        if self.config.loss == "hybrid":
            return self._hybrid_loss(
                state.params, state.batch_stats, batch, x_t,
                jax.random.fold_in(rng, 7),
            )
        pred, _ = self._forward(
            state.params, state.batch_stats, batch, x_t, t, train=False
        )
        return self._compute_loss(pred, noise, batch)

    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    def _train_scan_impl(
        self, state: TrainState, data: Batch, idx: jnp.ndarray,
        rngs: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def body(st, xs):
            ii, rr = xs
            batch = {k: v[ii] for k, v in data.items()}
            st, m = self._train_step_impl(st, batch, rr)
            return st, m["loss"]

        state, losses = jax.lax.scan(body, state, (idx, rngs))
        return state, {"loss": losses[-1], "loss_mean": losses.mean()}

    def train_scan(self, state, data, idx, rngs):
        """K train updates in ONE jitted call (``lax.scan``), gathering
        each step's batch on-device from the device-resident ``data``
        dict with a (K, B) int32 ``idx`` array and (K,) ``rngs`` keys.

        The remote-backend small-batch regime this exists for: a single
        ``train_step`` at 64px batch 20 is dispatch- and H2D-bound over
        a tunneled TPU (~1 MB of batch upload + one round-trip per
        update — the same measured bottleneck that motivated
        ``ProgressiveDistiller.distill_scan``, docs/PERFORMANCE.md
        round-4 notes). Scanning K updates per call uploads K*B*4 bytes
        of indices instead and pays dispatch once per K. Semantically
        identical to K sequential ``train_step`` calls on ``data[idx[k]]``
        batches with per-step key ``rngs[k]``
        (tests/test_trainer.py asserts equivalence). Host-side batch
        augmentation does not fit this path — use ``train_step`` when
        batches need per-step host transforms."""
        return self._train_scan(state, data, idx, rngs)

    def lr_scale(self, state) -> float:
        """Current plateau LR multiplier (1.0 when no plateau scheduler)."""
        from .optim import find_plateau_state

        ps = find_plateau_state(state.opt_state)
        return float(jax.device_get(ps.scale)) if ps is not None else 1.0

    def eval_step(self, state, batch, rng):
        return self._eval_step(state, batch, rng)

    # -- epoch loops ---------------------------------------------------------

    def train_epoch(
        self, state: TrainState, batches: Iterable[Batch], rng: jax.Array
    ) -> Tuple[TrainState, float]:
        """One pass over the loader; returns mean loss (the reference's
        pipeline.train contract, training_DANRA_conditional.py:775-1016)."""
        losses = []
        for i, batch in enumerate(batches):
            state, metrics = self.train_step(state, batch, jax.random.fold_in(rng, i))
            losses.append(metrics["loss"])
        mean = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        return state, mean

    def validate(
        self, state: TrainState, batches: Iterable[Batch], rng: jax.Array
    ) -> float:
        losses = [
            self.eval_step(state, batch, jax.random.fold_in(rng, i))
            for i, batch in enumerate(batches)
        ]
        return float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

    def fit(
        self,
        state: TrainState,
        train_loader: Callable[[], Iterable[Batch]],
        valid_loader: Optional[Callable[[], Iterable[Batch]]] = None,
        *,
        epochs: int = 1,
        rng: Optional[jax.Array] = None,
        checkpoint_fn: Optional[Callable[[TrainState, int, float], Any]] = None,
        log_fn: Optional[Callable[[int, float, float], Any]] = None,
        epoch_end_fn: Optional[Callable[[TrainState, int], Any]] = None,
    ) -> Tuple[TrainState, Dict[str, list]]:
        """Epoch loop with best-val checkpointing and early stopping
        (ddpm_DANRA_conditional_wValid.py:490-518; src/main_ddpm.py:458-472).

        ``train_loader``/``valid_loader`` are zero-arg callables returning
        a fresh batch iterator per epoch.
        """
        rng = jax.random.key(0) if rng is None else rng
        history = {"train_loss": [], "valid_loss": []}
        best = float("inf")
        patience_left = self.config.early_stopping_patience

        for epoch in range(epochs):
            ep_rng = jax.random.fold_in(rng, epoch)
            state, train_loss = self.train_epoch(state, train_loader(), ep_rng)
            history["train_loss"].append(train_loss)

            valid_loss = float("nan")
            if valid_loader is not None:
                valid_loss = self.validate(
                    state, valid_loader(), jax.random.fold_in(ep_rng, 10_000)
                )
                history["valid_loss"].append(valid_loss)

            if log_fn is not None:
                log_fn(epoch, train_loss, valid_loss)
            if epoch_end_fn is not None:
                # the reference's every-N-epochs sampling hook
                # (ddpm_DANRA_conditional_wValid.py:522-658)
                epoch_end_fn(state, epoch)

            monitor = valid_loss if valid_loader is not None else train_loss
            if monitor < best:
                best = monitor
                patience_left = self.config.early_stopping_patience
                if checkpoint_fn is not None:
                    checkpoint_fn(state, epoch, monitor)
            elif patience_left is not None:
                patience_left -= 1
                if patience_left <= 0:
                    break
        return state, history


__all__ = ["Trainer", "TrainerConfig"]
