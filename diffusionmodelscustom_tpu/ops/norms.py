"""Normalization ops used across the UNet family (NHWC layout).

* ``instance_norm`` — parity with torch ``nn.InstanceNorm2d`` defaults
  (affine=False, eps=1e-5, stats over spatial dims per sample/channel)
  as used by the DANRA decoder blocks
  (modules_DANRA_conditional.py:412-419).
* ``GroupNormSiLU`` — GroupNorm followed by SiLU/GELU, the clean-app and
  Imagen building block (src/unet_ms.py:37-43; imagen_pytorch.py:1498-1540).
  XLA fuses the normalize+activation elementwise chain into the
  surrounding convs; a dedicated Pallas kernel is only warranted if
  profiling shows HBM-bound normalization, so this stays jnp.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm over NHWC spatial dims, no affine transform."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class GroupNormSiLU(nn.Module):
    """GroupNorm -> activation, with optional FiLM-style (scale, shift).

    ``scale_shift`` implements the Imagen Block's conditioning insertion
    point: x = norm(x) * (scale + 1) + shift before the activation
    (imagen_pytorch.py:1498-1540).
    """

    num_groups: int = 8
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.silu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        scale_shift: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        groups = min(self.num_groups, x.shape[-1])
        x = nn.GroupNorm(num_groups=groups, dtype=self.dtype, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return self.activation(x)


__all__ = ["instance_norm", "GroupNormSiLU"]
