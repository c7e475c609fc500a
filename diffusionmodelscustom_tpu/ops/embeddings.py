"""Time/positional embeddings, fully vectorized for TPU.

The reference has three sinusoidal-embedding variants with *different*
layouts and bases — all are reproduced here because they are not
numerically interchangeable:

* ``sinusoidal_embedding`` — interleaved [sin, cos, sin, cos, ...] with
  base n=10000; the reference computes this with a Python double loop over
  batch x dim executed on every decoder forward (a top-3 hotspot,
  modules_DANRA_conditional.py:42-63 / SURVEY.md section 3 hot-loop #3);
  here it is one vectorized outer product.
* ``pos_encoding_block`` — block layout [sin-block | cos-block]; the g2
  encoder uses base n=1000 (modules_DANRA_conditional.py:203-211), the
  clean app's alternative UNet uses n=10000 (src/unet_ms.py:138-146).
* ``learned_sinusoidal_embedding`` params live in the Imagen UNet
  (CascadedDDPM/imagen_pytorch.py:1449-1463); the pure function here takes
  the learned frequencies as an argument.
"""

from __future__ import annotations

import jax.numpy as jnp


def sinusoidal_embedding(
    t: jnp.ndarray, dim: int, n: float = 10000.0, dtype=jnp.float32
) -> jnp.ndarray:
    """Interleaved sinusoidal embedding (SinusoidalEmbedding parity).

    out[b, 2i]   = sin(t[b] / n^(2i/dim))
    out[b, 2i+1] = cos(t[b] / n^(2i/dim))
    (modules_DANRA_conditional.py:54-61, vectorized).
    """
    assert dim % 2 == 0, "dim must be even"
    t = t.astype(jnp.float32).reshape(-1, 1)
    freqs = jnp.exp(
        -jnp.log(n) * (2.0 * jnp.arange(dim // 2, dtype=jnp.float32) / dim)
    )
    angles = t * freqs  # (B, dim//2)
    # interleave sin/cos along the last axis
    out = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1).reshape(
        t.shape[0], dim
    )
    return out.astype(dtype)


def pos_encoding_block(
    t: jnp.ndarray, dim: int, n: float = 1000.0, dtype=jnp.float32
) -> jnp.ndarray:
    """Block-layout sinusoidal embedding: [sin(t*w) | cos(t*w)].

    inv_freq = 1 / n^(arange(0, dim, 2)/dim); the g2 encoder's
    ``pos_encoding`` with n=1000 (modules_DANRA_conditional.py:203-211);
    pass n=10000 for the clean app's UNet (src/unet_ms.py:138-146).
    """
    assert dim % 2 == 0, "dim must be even"
    t = t.astype(jnp.float32).reshape(-1, 1)
    inv_freq = 1.0 / (
        n ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    angles = t * inv_freq  # (B, dim//2)
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1).astype(dtype)


def learned_sinusoidal_embedding(
    t: jnp.ndarray, weights: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """Learned-frequency sinusoidal features: [t, sin(2pi t w), cos(2pi t w)].

    ``weights`` has shape (half_dim,); output dim is 2*half_dim + 1
    (CascadedDDPM/imagen_pytorch.py:1449-1463 semantics).
    """
    t = t.astype(jnp.float32).reshape(-1, 1)
    angles = t * weights.reshape(1, -1) * 2.0 * jnp.pi
    return jnp.concatenate([t, jnp.sin(angles), jnp.cos(angles)], axis=-1).astype(
        dtype
    )


__all__ = [
    "sinusoidal_embedding",
    "pos_encoding_block",
    "learned_sinusoidal_embedding",
]
