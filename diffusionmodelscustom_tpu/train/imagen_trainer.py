"""Cascade trainer: per-unet optimizer/EMA state over an Imagen cascade.

Rebuild of ``ImagenTrainer`` (CascadedDDPM/trainer.py:293-1066):

* per-unet Adam/Lion optimizer + EMA + warmup/cosine schedule
  (trainer.py:402-446);
* only-one-unet-trained-at-a-time (trainer.py:520-558) — states are
  created lazily per stage and steps address a stage by ``unet_number``
  (1-indexed like the reference);
* gradient-accumulation via ``max_batch_size`` chunking
  (trainer.py:1042-1066) is replaced by optax.MultiSteps;
* ``sample()`` swaps in EMA parameters (trainer.py:1028-1039);
* checkpointing of the full per-unet state via utils/checkpoint.py
  (trainer.py:755-890).

Distribution: instead of Accelerate/DDP (trainer.py:352-358), pass a
``jax.sharding.Mesh`` at construction. Per-unet states are placed with
the fsdp rule (parallel/sharding.py), batches (images + text arrays) are
sharded on the ``data`` axis inside ``train_step``, and XLA emits the
gradient all-reduce / all-gather collectives — the SPMD equivalent of
the reference's bucketed NCCL all-reduce (trainer.py:1060-1066).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.imagen.cascade import Imagen
from ..parallel.sharding import batch_sharding, state_sharding
from .optim import make_optimizer, warmup_cosine_schedule
from .state import TrainState


@dataclasses.dataclass
class ImagenTrainerConfig:
    """Mirrors the reference trainer's constructor surface
    (trainer.py:296-360)."""

    optimizer: str = "adam"
    learning_rate: float = 1e-4
    eps: float = 1e-8
    beta1: float = 0.9
    beta2: float = 0.99
    max_grad_norm: Optional[float] = None
    grad_accum_steps: int = 1
    use_ema: bool = True
    ema_decay: float = 0.995
    warmup_steps: Optional[int] = None
    cosine_decay_max_steps: Optional[int] = None
    # persistence (trainer.py:322-336,712-753): periodic checkpoints into a
    # folder with oldest-first rotation
    checkpoint_path: Optional[str] = None
    checkpoint_every: Optional[int] = None
    max_checkpoints_keep: int = 3
    # exclusive-stage lock (trainer.py:520-558): when set, train_step on
    # any other unet raises
    only_train_unet: Optional[int] = None


class ImagenTrainer:
    """Stateful orchestrator over a functional Imagen cascade."""

    def __init__(
        self,
        imagen: Imagen,
        config: ImagenTrainerConfig = ImagenTrainerConfig(),
        *,
        text_embed_dim: Optional[int] = None,
        mesh: Optional["jax.sharding.Mesh"] = None,
        fsdp_min_size: int = 2**14,
    ):
        self.imagen = imagen
        self.config = config
        self.text_embed_dim = text_embed_dim
        # SPMD: states live fsdp-sharded on the mesh, batches shard on
        # ``data`` — replaces the reference's Accelerate DDP wrap
        # (trainer.py:352-358)
        self.mesh = mesh
        self.fsdp_min_size = fsdp_min_size
        self._state_shardings: Dict[int, Any] = {}
        self.states: Dict[int, TrainState] = {}
        self._train_steps: Dict[int, Any] = {}
        self.num_unets = len(imagen.unets)
        self._sample_jits: Dict[Any, Any] = {}
        self._train_dl = None
        self._valid_dl = None
        self._train_iter = None
        self._valid_iter = None
        if config.checkpoint_path is not None:
            # resume automatically when the folder already holds checkpoints
            # (the reference's load_from_checkpoint_folder-on-init,
            # trainer.py:329-336)
            self.load_from_checkpoint_folder(missing_ok=True)

    # -- state management --------------------------------------------------

    def _make_tx(self) -> optax.GradientTransformation:
        cfg = self.config
        schedule = None
        if cfg.warmup_steps is not None or cfg.cosine_decay_max_steps is not None:
            schedule = warmup_cosine_schedule(
                cfg.learning_rate,
                cfg.warmup_steps or 0,
                cfg.cosine_decay_max_steps or 10**9,
            )
        tx = make_optimizer(
            cfg.optimizer,
            cfg.learning_rate,
            weight_decay=0.0,
            beta1=cfg.beta1,
            beta2=cfg.beta2,
            eps=cfg.eps,
            grad_clip_norm=cfg.max_grad_norm,
            schedule=schedule,
        )
        if cfg.grad_accum_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
        return tx

    def init_unet(self, unet_number: int, rng: jax.Array) -> TrainState:
        """Lazily create the state for one stage (1-indexed)."""
        idx = unet_number - 1
        if idx in self.states:
            return self.states[idx]
        variables = self.imagen.init_unet_params(
            idx, rng, text_embed_dim=self.text_embed_dim
        )
        state = TrainState.create(
            apply_fn=self.imagen.unets[idx].apply,
            params=variables["params"],
            tx=self._make_tx(),
            use_ema=self.config.use_ema,
            ema_decay=self.config.ema_decay,
        )
        state = self._place(idx, state)
        self.states[idx] = state
        return state

    def _place(self, idx: int, state: TrainState) -> TrainState:
        """Device_put a state onto its mesh sharding (no-op without a
        mesh). Shardings are cached per stage for the jitted step's
        out_shardings."""
        if self.mesh is None:
            return state
        if idx not in self._state_shardings:
            self._state_shardings[idx] = state_sharding(
                self.mesh, state, min_size=self.fsdp_min_size
            )
        sh = self._state_shardings[idx]
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
            state,
            sh,
        )

    def _shard_batch_arrays(self, *arrays):
        """Shard batch-leading arrays on the mesh ``data`` axis (None
        passes through)."""
        if self.mesh is None:
            return arrays
        s = batch_sharding(self.mesh)
        return tuple(
            jax.device_put(a, s) if a is not None else None for a in arrays
        )

    def num_steps_taken(self, unet_number: int) -> int:
        idx = unet_number - 1
        if idx not in self.states:
            return 0
        return int(jax.device_get(self.states[idx].step))

    # -- training ----------------------------------------------------------

    def _build_train_step(self, idx: int):
        imagen = self.imagen

        def step_fn(
            state: TrainState, images, text_embeds, text_mask, cond_images, rng
        ):
            def loss_fn(params):
                return imagen.p_losses(
                    idx,
                    {"params": params},
                    images,
                    rng,
                    text_embeds=text_embeds,
                    text_mask=text_mask,
                    cond_images=cond_images,
                    train=True,
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        if self.mesh is not None and idx in self._state_shardings:
            # pin the updated state to the same fsdp layout (XLA emits the
            # grad reduce-scatter / param all-gather from these shardings)
            return jax.jit(
                step_fn,
                donate_argnums=(0,),
                out_shardings=(self._state_shardings[idx], None),
            )
        return jax.jit(step_fn, donate_argnums=(0,))

    # -- managed dataloaders (trainer.py:682-711) ---------------------------

    def add_train_dataloader(self, loader) -> None:
        """Attach a re-iterable loader; ``train_step`` without images pulls
        batches from it, cycling across epochs (step_with_dl_iter)."""
        self._train_dl = loader
        self._train_iter = iter(loader)

    def add_valid_dataloader(self, loader) -> None:
        self._valid_dl = loader
        self._valid_iter = iter(loader)

    def _next_batch(self, which: str):
        dl = self._train_dl if which == "train" else self._valid_dl
        if dl is None:
            raise ValueError(
                f"no images given and no {which} dataloader attached; call "
                f"add_{which}_dataloader first (trainer.py:682-711 contract)"
            )
        it_attr = "_train_iter" if which == "train" else "_valid_iter"
        try:
            batch = next(getattr(self, it_attr))
        except StopIteration:
            setattr(self, it_attr, iter(dl))
            batch = next(getattr(self, it_attr))
        if isinstance(batch, dict):
            return (
                batch["images"],
                batch.get("text_embeds"),
                batch.get("text_mask"),
                batch.get("cond_images"),
            )
        if isinstance(batch, (tuple, list)):
            padded = list(batch) + [None, None, None]
            return padded[0], padded[1], padded[2], padded[3]
        return batch, None, None, None

    def train_step(
        self,
        unet_number: int,
        images: Optional[jnp.ndarray] = None,
        *,
        text_embeds: Optional[jnp.ndarray] = None,
        text_mask: Optional[jnp.ndarray] = None,
        cond_images: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> float:
        """One optimization step on one cascade stage; returns the loss
        (the reference's trainer.train_step contract,
        trainer.py:682-711). With no ``images``, pulls from the managed
        train dataloader. Periodically checkpoints when
        ``checkpoint_every`` is set (trainer.py:1012-1023)."""
        cfg = self.config
        if cfg.only_train_unet is not None and unet_number != cfg.only_train_unet:
            raise ValueError(
                f"trainer is locked to unet {cfg.only_train_unet} "
                f"(only_train_unet, trainer.py:520-558); got {unet_number}"
            )
        if images is None:
            images, dl_embeds, dl_mask, dl_cond = self._next_batch("train")
            text_embeds = text_embeds if text_embeds is not None else dl_embeds
            text_mask = text_mask if text_mask is not None else dl_mask
            cond_images = cond_images if cond_images is not None else dl_cond
        idx = unet_number - 1
        rng = jax.random.key(0) if rng is None else rng
        state = self.init_unet(unet_number, rng)
        images, text_embeds, text_mask, cond_images = self._shard_batch_arrays(
            images, text_embeds, text_mask, cond_images
        )
        if idx not in self._train_steps:
            self._train_steps[idx] = self._build_train_step(idx)
        new_state, loss = self._train_steps[idx](
            state, images, text_embeds, text_mask, cond_images, rng
        )
        self.states[idx] = new_state
        if (
            cfg.checkpoint_every is not None
            and cfg.checkpoint_path is not None
            and self.num_steps_taken(unet_number) % cfg.checkpoint_every == 0
        ):
            self.save_to_checkpoint_folder()
        return float(jax.device_get(loss))

    def valid_step(
        self,
        unet_number: int,
        images: Optional[jnp.ndarray] = None,
        *,
        text_embeds=None,
        text_mask=None,
        cond_images=None,
        rng: Optional[jax.Array] = None,
    ) -> float:
        if images is None:
            images, dl_embeds, dl_mask, dl_cond = self._next_batch("valid")
            text_embeds = text_embeds if text_embeds is not None else dl_embeds
            text_mask = text_mask if text_mask is not None else dl_mask
            cond_images = cond_images if cond_images is not None else dl_cond
        idx = unet_number - 1
        rng = jax.random.key(1) if rng is None else rng
        state = self.init_unet(unet_number, rng)
        images, text_embeds, text_mask, cond_images = self._shard_batch_arrays(
            images, text_embeds, text_mask, cond_images
        )
        loss = self.imagen.p_losses(
            idx,
            {"params": state.params},
            images,
            rng,
            text_embeds=text_embeds,
            text_mask=text_mask,
            cond_images=cond_images,
            train=False,
        )
        return float(jax.device_get(loss))

    # -- sampling ----------------------------------------------------------

    def sample(self, rng: Optional[jax.Array] = None, **kwargs) -> jnp.ndarray:
        """Cascade sampling with EMA parameters when available
        (trainer.py:1028-1039).

        The standard path (batch_size/cond_scale + optional text arrays) is
        jitted and cached: an eager cascade walk re-traces every stage's
        scan body per call — measured 22x slower on v5e (bench.py).
        Unusual kwargs (inpainting, start images) fall back to eager.
        """
        rng = jax.random.key(2) if rng is None else rng
        params_list: List[Any] = []
        for idx in range(self.num_unets):
            state = self.init_unet(idx + 1, jax.random.fold_in(rng, idx))
            params = (
                state.ema_params if state.ema_params is not None else state.params
            )
            params_list.append({"params": params})

        array_keys = {"text_embeds", "text_mask", "cond_images"}
        static = {k: v for k, v in kwargs.items() if k not in array_keys}
        arrays = {k: kwargs[k] for k in array_keys if kwargs.get(k) is not None}
        simple = set(static) <= {"batch_size", "cond_scale", "stop_at_unet_number"}
        if not simple:
            return self.imagen.sample(params_list, rng, **kwargs)

        cache_key = (tuple(sorted(static.items())), tuple(sorted(arrays)))
        fn = self._sample_jits.get(cache_key)
        if fn is None:
            jit_kw = {}
            if self.mesh is not None:
                # sampled batch sharded on ``data``: the whole cascade walk
                # (every stage's scan) runs SPMD over the mesh
                jit_kw["out_shardings"] = batch_sharding(self.mesh)
            fn = jax.jit(
                lambda p, r, **akw: self.imagen.sample(p, r, **static, **akw),
                **jit_kw,
            )
            self._sample_jits[cache_key] = fn
        if arrays:
            shards = self._shard_batch_arrays(*arrays.values())
            arrays = dict(zip(arrays.keys(), shards))
        return fn(params_list, rng, **arrays)

    # -- persistence ---------------------------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        """All per-unet states as a pytree for checkpointing."""
        return {str(i): s for i, s in self.states.items()}

    def load_state_dict(self, states: Dict[str, Any]) -> None:
        for key, s in states.items():
            self.states[int(key)] = s

    def save_to_checkpoint_folder(self, folder=None) -> str:
        """Write ``<folder>/ckpt_<steps>/unet<N>`` for every initialized
        stage and rotate old checkpoints down to ``max_checkpoints_keep``
        (trainer.py:712-753's checkpoint_every/max_checkpoints_keep).
        ``folder`` may be a local path or any fsspec URL (``memory://``,
        ``gs://`` … — trainer.py:329-336's fsspec folder support)."""
        from ..utils.checkpoint import FolderFS, save_pytree

        ffs = FolderFS(folder or self.config.checkpoint_path)
        ffs.mkdirs()
        steps = max(
            (self.num_steps_taken(i + 1) for i in range(self.num_unets)),
            default=0,
        )
        tag = ffs.join(f"ckpt_{steps}")
        for i, state in self.states.items():
            save_pytree(FolderFS.child(tag, f"unet{i + 1}"), state)
        ckpts = ffs.list_ckpts()
        while len(ckpts) > self.config.max_checkpoints_keep:
            FolderFS.rmtree(ckpts.pop(0)[1])
        return tag

    def load_from_checkpoint_folder(
        self, folder=None, *, step: Optional[int] = None, missing_ok: bool = False
    ) -> bool:
        """Exact-state resume from the newest (or ``step``-tagged)
        checkpoint in the rotation folder (local path or fsspec URL).
        Returns True when restored."""
        from ..utils.checkpoint import FolderFS

        ffs = FolderFS(folder or self.config.checkpoint_path)
        ckpts = ffs.list_ckpts()
        if step is not None:
            ckpts = [c for c in ckpts if c[0] == step]
        if not ckpts:
            if missing_ok:
                return False
            raise FileNotFoundError(f"no ckpt_* checkpoints under {ffs.folder}")
        # exact resume: no EMA promotion (that is a sampling-time choice)
        load_imagen_from_checkpoint(ckpts[-1][1], self, use_ema=False)
        return True


def load_imagen_from_checkpoint(
    checkpoint_dir,
    trainer: "ImagenTrainer",
    *,
    use_ema: bool = True,
    rng=None,
):
    """Restore per-unet states saved as ``<dir>/unet<N>`` and optionally
    promote EMA weights into the live params (the reference's
    load_imagen_from_checkpoint EMA promotion, CascadedDDPM/utils.py:57-73).
    ``checkpoint_dir`` may be a local path or an fsspec URL. Returns the
    trainer for chaining."""
    import jax as _jax
    import jax.numpy as _jnp

    from ..utils.checkpoint import FolderFS, restore_pytree

    rng = _jax.random.key(0) if rng is None else rng
    for i in range(trainer.num_unets):
        template = trainer.init_unet(i + 1, _jax.random.fold_in(rng, i))
        if not FolderFS.unet_exists(str(checkpoint_dir), f"unet{i + 1}"):
            continue
        path = FolderFS.child(str(checkpoint_dir), f"unet{i + 1}")
        state = restore_pytree(
            path, _jax.tree_util.tree_map(_jnp.zeros_like, template)
        )
        if use_ema and state.ema_params is not None:
            state = state.replace(params=state.ema_params)
        trainer.states[i] = trainer._place(i, state)
    return trainer


__all__ = ["ImagenTrainer", "ImagenTrainerConfig", "load_imagen_from_checkpoint"]
