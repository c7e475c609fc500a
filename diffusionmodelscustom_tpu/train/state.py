"""Train state: params + optimizer + EMA + BatchNorm stats in one pytree.

Replaces the reference's scattered state handling (model/optimizer saved as
a dict at training_DANRA_conditional.py:755-772; EMA + per-unet optimizer
state inside ImagenTrainer, CascadedDDPM/trainer.py:402-446). A single
``flax.struct`` pytree keeps everything shardable and donat-able through
``jit``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    """Full training state as one pytree.

    ``ema_params`` mirrors the reference trainer's EMA unets
    (CascadedDDPM/trainer.py:402-446); ``batch_stats`` carries the DANRA
    encoder's BatchNorm running statistics (modules_DANRA_conditional.py
    ResNet trunk). Both are optional pytrees (None when unused).
    """

    step: jnp.ndarray
    apply_fn: Callable = struct.field(pytree_node=False)
    params: core.FrozenDict[str, Any]
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    opt_state: optax.OptState
    batch_stats: Optional[core.FrozenDict[str, Any]] = None
    ema_params: Optional[core.FrozenDict[str, Any]] = None
    ema_decay: float = struct.field(pytree_node=False, default=0.995)

    def apply_gradients(self, *, grads, value=None, **kwargs) -> "TrainState":
        """``value`` (the scalar train loss) is forwarded to ``tx.update``
        for transforms that consume it — optax.contrib.reduce_on_plateau,
        the ReduceLROnPlateau equivalent the reference steps on train loss
        (ddpm_DANRA_conditional_wValid.py:417,679)."""
        extra = {} if value is None else {"value": value}
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params, **extra
        )
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            **kwargs,
        )

    @classmethod
    def create(
        cls,
        *,
        apply_fn: Callable,
        params,
        tx: optax.GradientTransformation,
        batch_stats=None,
        use_ema: bool = False,
        ema_decay: float = 0.995,
        **kwargs,
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            apply_fn=apply_fn,
            params=params,
            tx=tx,
            opt_state=tx.init(params),
            batch_stats=batch_stats,
            ema_params=jax.tree_util.tree_map(jnp.copy, params)
            if use_ema
            else None,
            ema_decay=ema_decay,
            **kwargs,
        )


__all__ = ["TrainState"]
