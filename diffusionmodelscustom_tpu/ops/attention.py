"""Self-attention over image feature maps.

TPU-native rebuild of the reference attention stack:

* ``ImageSelfAttention`` — LayerNorm -> multi-head attention over the
  H*W token axis -> residual add of the *un-normalized* input (that
  ordering is a reference quirk kept for parity,
  modules_DANRA_conditional.py:91-110).
* With ``use_ffn=True`` it adds the transformer feed-forward block the
  clean app bolted on (LN -> Linear -> GELU -> Linear, residual;
  DDPM_clean_application/src/unet.py:87-116 and src/unet_ms.py:14-27).

The attention core routes through :func:`attention_core`, which uses the
fused Pallas flash-attention kernel on TPU (ops/flash_attention.py) and a
plain jnp einsum everywhere else. Sequence lengths here are H*W tokens
(<= 4096 for 128x128 inputs), so a single-chip fused kernel is the right
scale — no sequence parallelism needed (SURVEY.md section 5.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    use_flash: Optional[bool] = None,
    qk_int8: bool = False,
    pv_int8: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention. q/k/v: (B, S, H, D) -> (B, S, H, D).

    ``use_flash=None`` auto-selects the Pallas kernel on TPU backends.
    ``qk_int8`` routes through the serving-only dynamic-int8 QK path
    (ops/flash_attention.py) on any backend; ``pv_int8`` additionally
    quantizes the PV matmul (implies qk_int8).
    """
    if pv_int8:
        from .flash_attention import (
            _qkpv_int8_attention, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
        )

        return _qkpv_int8_attention(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    if qk_int8:
        from .flash_attention import _qk_int8_attention, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K

        return _qk_int8_attention(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    if use_flash:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    # softmax in f32 for stability regardless of compute dtype
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


class MultiHeadSelfAttention(nn.Module):
    """Multi-head self-attention over a token axis (B, S, C) -> (B, S, C).

    Mirrors torch ``nn.MultiheadAttention(C, n_heads)`` structure: a fused
    qkv projection with bias plus an output projection with bias
    (modules_DANRA_conditional.py:89).
    """

    n_heads: int
    use_flash: Optional[bool] = None
    qk_int8: bool = False
    pv_int8: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, c = x.shape
        assert c % self.n_heads == 0, "channels must divide n_heads"
        head_dim = c // self.n_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.n_heads, head_dim)
        k = k.reshape(b, s, self.n_heads, head_dim)
        v = v.reshape(b, s, self.n_heads, head_dim)
        out = attention_core(
            q, k, v, use_flash=self.use_flash, qk_int8=self.qk_int8,
            pv_int8=self.pv_int8,
        )
        out = out.reshape(b, s, c)
        return nn.Dense(c, dtype=self.dtype, name="out")(out)


class ImageSelfAttention(nn.Module):
    """Image self-attention block (NHWC in, NHWC out).

    Token path: reshape (B,H,W,C) -> (B,HW,C); LayerNorm; MHA; residual
    add of the un-normalized tokens (modules_DANRA_conditional.py:103-107).
    ``use_ffn`` appends the clean app's FF block (src/unet_ms.py:14-27):
    out = FF(attn_out) + attn_out with FF = LN->Dense->GELU->Dense.
    """

    n_heads: int
    use_ffn: bool = False
    use_flash: Optional[bool] = None
    qk_int8: bool = False
    pv_int8: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        normed = nn.LayerNorm(dtype=self.dtype, name="ln")(tokens)
        attn = MultiHeadSelfAttention(
            self.n_heads,
            use_flash=self.use_flash,
            qk_int8=self.qk_int8,
            pv_int8=self.pv_int8,
            dtype=self.dtype,
            name="mha",
        )(normed)
        out = attn + tokens
        if self.use_ffn:
            ff = nn.LayerNorm(dtype=self.dtype, name="ff_ln")(out)
            ff = nn.Dense(c, dtype=self.dtype, name="ff_dense1")(ff)
            ff = nn.gelu(ff)
            ff = nn.Dense(c, dtype=self.dtype, name="ff_dense2")(ff)
            out = ff + out
        return out.reshape(b, h, w, c)


__all__ = ["attention_core", "MultiHeadSelfAttention", "ImageSelfAttention"]
