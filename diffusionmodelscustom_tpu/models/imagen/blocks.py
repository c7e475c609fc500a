"""Imagen attention/block library additions (SURVEY.md C29).

* ``PerceiverResampler`` — latent-query cross-attention pooling of text
  tokens into a fixed number of summary tokens
  (CascadedDDPM/imagen_pytorch.py:1068-1170);
* ``CrossEmbedLayer`` — multi-kernel-size stem convolution
  (imagen_pytorch.py:2220-2260);
* ``PixelShuffleUpsample`` — conv to 4C channels + depth-to-space, the
  anti-checkerboard upsampler (imagen_pytorch.py:1320-1350);
* ``GlobalContext`` — squeeze-excite style global conditioning
  (imagen_pytorch.py:1998-2040).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.resize import pixel_shuffle


class PerceiverAttention(nn.Module):
    """Latents attend to [tokens ++ latents] (imagen_pytorch.py:1106-1160)."""

    n_heads: int = 8
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        latents: jnp.ndarray,  # (B, M, D)
        tokens: jnp.ndarray,  # (B, L, D)
        mask: Optional[jnp.ndarray] = None,  # (B, L)
    ) -> jnp.ndarray:
        b, m, d = latents.shape
        inner = self.n_heads * self.head_dim
        latents_n = nn.LayerNorm(dtype=self.dtype, name="latents_ln")(latents)
        tokens_n = nn.LayerNorm(dtype=self.dtype, name="tokens_ln")(tokens)
        kv_input = jnp.concatenate([tokens_n, latents_n], axis=1)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents_n)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(kv_input)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(kv_input)
        q = q.reshape(b, m, self.n_heads, self.head_dim)
        k = k.reshape(b, -1, self.n_heads, self.head_dim)
        v = v.reshape(b, -1, self.n_heads, self.head_dim)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * self.head_dim**-0.5
        if mask is not None:
            full = jnp.concatenate(
                [mask.astype(bool), jnp.ones((b, m), bool)], axis=1
            )
            logits = jnp.where(full[:, None, None, :], logits, jnp.float32(-1e9))
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, m, inner)
        return nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_out")(out)


class PerceiverResampler(nn.Module):
    """Fixed-size latent summary of variable-length text tokens."""

    depth: int = 2
    num_latents: int = 64
    n_heads: int = 8
    head_dim: int = 64
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, tokens: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, l, d = tokens.shape
        latents = self.param(
            "latents", nn.initializers.normal(0.02), (self.num_latents, d),
            jnp.float32,
        )
        lat = jnp.broadcast_to(latents[None], (b, self.num_latents, d)).astype(
            self.dtype
        )
        for i in range(self.depth):
            lat = lat + PerceiverAttention(
                n_heads=self.n_heads,
                head_dim=self.head_dim,
                dtype=self.dtype,
                name=f"attn_{i}",
            )(lat, tokens, mask)
            ff = nn.LayerNorm(dtype=self.dtype, name=f"ff_ln_{i}")(lat)
            ff = nn.Dense(d * self.ff_mult, dtype=self.dtype, name=f"ff1_{i}")(ff)
            ff = nn.gelu(ff)
            ff = nn.Dense(d, dtype=self.dtype, name=f"ff2_{i}")(ff)
            lat = lat + ff
        return lat


class CrossEmbedLayer(nn.Module):
    """Stem conv with multiple kernel sizes concatenated channel-wise
    (imagen_pytorch.py:2220-2260)."""

    dim_out: int
    kernel_sizes: Sequence[int] = (3, 7, 15)
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernels = sorted(self.kernel_sizes)
        n = len(kernels)
        # channel split: each scale gets dim_out // 2^(i+1), remainder to last
        dims = [int(self.dim_out / (2 ** (i + 1))) for i in range(1, n)]
        dims = [self.dim_out - sum(dims)] + dims
        outs = []
        for k, d in zip(kernels, dims):
            # padding (k-1)//2 keeps power-of-two map sizes under stride 2
            # (the reference's (k - stride)//2 yields odd 7x7 maps from 16x16
            # inputs, imagen_pytorch.py:2242 — divergence chosen for TPU
            # tiling friendliness; stride-1 behavior is identical)
            outs.append(
                nn.Conv(
                    d,
                    (k, k),
                    strides=self.stride,
                    padding=(k - 1) // 2,
                    dtype=self.dtype,
                    name=f"conv_k{k}",
                )(x)
            )
        return jnp.concatenate(outs, axis=-1)


class PixelShuffleUpsample(nn.Module):
    """Conv -> SiLU -> depth-to-space 2x (imagen_pytorch.py:1320-1350);
    initialized conv-kernel-replicated (ICNR) so every output channel's
    2x2 depth-to-space block is identical at init — the anti-checkerboard
    property the reference's init_conv_ provides (kaiming on dim_out
    channels, then repeat 4x)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def icnr(key, shape, dtype=jnp.float32):
            # ops.resize.pixel_shuffle reads channels as (r, r, c_out),
            # so the 4 contributing channels of output channel co are
            # {k*c_out + co}: tile a (.., c_out) base 4x along the last
            # axis to make them identical
            kh, kw, cin, cout4 = shape
            base = nn.initializers.he_uniform()(
                key, (kh, kw, cin, cout4 // 4), dtype
            )
            return jnp.tile(base, (1, 1, 1, 4))

        h = nn.Conv(
            self.dim_out * 4, (1, 1), kernel_init=icnr,
            dtype=self.dtype, name="conv",
        )(x)
        h = nn.silu(h)
        return pixel_shuffle(h, 2)


class GlobalContext(nn.Module):
    """Attention-pooled squeeze-excite (imagen_pytorch.py:1998-2040):
    spatial softmax pooling -> bottleneck MLP -> sigmoid gate."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        weights = nn.Conv(1, (1, 1), dtype=self.dtype, name="to_k")(x)
        weights = jax.nn.softmax(
            weights.reshape(b, h * w, 1).astype(jnp.float32), axis=1
        ).astype(x.dtype)
        pooled = jnp.einsum("bsc,bso->boc", x.reshape(b, h * w, c), weights)
        pooled = pooled.reshape(b, 1, 1, c)
        hidden = max(3, self.dim_out // 2)
        g = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="net1")(pooled)
        g = nn.silu(g)
        g = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="net2")(g)
        return nn.sigmoid(g)


def _l2norm(t: jnp.ndarray) -> jnp.ndarray:
    return t * jax.lax.rsqrt(
        jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1, keepdims=True) + 1e-12
    ).astype(t.dtype)


class CosineSimAttention(nn.Module):
    """Self-attention with cosine-similarity QK normalization
    (the cascade's ``Attention``, imagen_pytorch.py:1171-1296).

    Quirks kept: keys/values are SINGLE-head (shared across query heads,
    'b j d' in the reference einsum); a learned null KV pair precedes real
    keys; learnable per-dim q/k scales after l2 normalization; fixed logit
    scale (default 8); optional extra context keys from ``to_context``.
    """

    dim_head: int = 64
    heads: int = 8
    context_dim: Optional[int] = None
    scale: float = 8.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, N, C)
        context: Optional[jnp.ndarray] = None,  # (B, L, context_dim)
        mask: Optional[jnp.ndarray] = None,  # (B, N) over x's keys
    ) -> jnp.ndarray:
        b, n, c = x.shape
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(
            2 * self.dim_head, use_bias=False, dtype=self.dtype, name="to_kv"
        )(x)
        k, v = jnp.split(kv, 2, axis=-1)  # (B, N, D) single-head

        null_kv = self.param(
            "null_kv", nn.initializers.normal(1.0), (2, self.dim_head), jnp.float32
        ).astype(self.dtype)
        k = jnp.concatenate([jnp.broadcast_to(null_kv[0], (b, 1, self.dim_head)), k], 1)
        v = jnp.concatenate([jnp.broadcast_to(null_kv[1], (b, 1, self.dim_head)), v], 1)

        if context is not None:
            ctx = nn.LayerNorm(dtype=self.dtype, name="context_norm")(context)
            ckv = nn.Dense(
                2 * self.dim_head, dtype=self.dtype, name="to_context"
            )(ctx)
            ck, cv = jnp.split(ckv, 2, axis=-1)
            k = jnp.concatenate([ck, k], axis=1)
            v = jnp.concatenate([cv, v], axis=1)

        q = q.reshape(b, n, self.heads, self.dim_head)
        q = _l2norm(q) * self.param(
            "q_scale", nn.initializers.ones, (self.dim_head,), jnp.float32
        ).astype(self.dtype)
        k = _l2norm(k) * self.param(
            "k_scale", nn.initializers.ones, (self.dim_head,), jnp.float32
        ).astype(self.dtype)

        sim = jnp.einsum("bihd,bjd->bhij", q, k) * self.scale
        if mask is not None:
            pad = k.shape[1] - mask.shape[1]
            full = jnp.concatenate(
                [jnp.ones((b, pad), bool), mask.astype(bool)], axis=1
            )
            sim = jnp.where(full[:, None, None, :], sim, jnp.float32(-1e9))
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhij,bjd->bihd", attn, v).reshape(b, n, inner)
        out = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_out")(out)
        return nn.LayerNorm(dtype=self.dtype, name="out_norm")(out)


class LinearAttention(nn.Module):
    """O(N) self-attention over feature maps (imagen_pytorch.py:1881-1996):
    1x1 + depthwise-3x3 projections, q softmax over features / k softmax
    over positions, per-head d x e context matrix, SiLU then 1x1 out."""

    dim_head: int = 32
    heads: int = 8
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        fmap: jnp.ndarray,  # (B, H, W, C)
        context: Optional[jnp.ndarray] = None,  # (B, L, context_dim)
    ) -> jnp.ndarray:
        b, hh, ww, c = fmap.shape
        inner = self.dim_head * self.heads
        scale = self.dim_head**-0.5
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(fmap)

        def proj(name):
            y = nn.Conv(
                inner, (1, 1), use_bias=False, dtype=self.dtype, name=f"{name}_1x1"
            )(h)
            y = nn.Conv(
                inner, (3, 3), padding=1, use_bias=False,
                feature_group_count=inner, dtype=self.dtype, name=f"{name}_dw",
            )(y)
            return y.reshape(b, hh * ww, self.heads, self.dim_head)

        q, k, v = proj("to_q"), proj("to_k"), proj("to_v")

        if context is not None:
            ckv = nn.Dense(
                2 * inner, use_bias=False, dtype=self.dtype, name="to_context"
            )(nn.LayerNorm(dtype=self.dtype, name="context_norm")(context))
            ck, cv = jnp.split(ckv, 2, axis=-1)
            ck = ck.reshape(b, -1, self.heads, self.dim_head)
            cv = cv.reshape(b, -1, self.heads, self.dim_head)
            k = jnp.concatenate([k, ck], axis=1)
            v = jnp.concatenate([v, cv], axis=1)

        q = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * scale
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1)
        ctx = jnp.einsum("bnhd,bnhe->bhde", k, v.astype(jnp.float32))
        out = jnp.einsum("bnhd,bhde->bnhe", q, ctx).astype(self.dtype)
        out = nn.silu(out.reshape(b, hh, ww, inner))
        out = nn.Conv(
            c, (1, 1), use_bias=False, dtype=self.dtype, name="to_out"
        )(out)
        return nn.LayerNorm(dtype=self.dtype, name="out_norm")(out)


class LinearCrossAttention(nn.Module):
    """O(N) cross-attention to text tokens (imagen_pytorch.py:1807-1880):
    same linear-attention math, keys/values from the context, learned null
    KV, masked keys pushed to -inf before the position softmax."""

    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, N, C)
        context: jnp.ndarray,  # (B, L, D)
        mask: Optional[jnp.ndarray] = None,  # (B, L)
    ) -> jnp.ndarray:
        b, n, c = x.shape
        inner = self.dim_head * self.heads
        scale = self.dim_head**-0.5
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        context = nn.LayerNorm(dtype=self.dtype, name="context_norm")(context)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype, name="to_kv")(
            context
        )
        k, v = jnp.split(kv, 2, axis=-1)

        null_kv = self.param(
            "null_kv", nn.initializers.normal(1.0), (2, self.dim_head), jnp.float32
        ).astype(self.dtype)
        nk = jnp.broadcast_to(null_kv[0], (b, 1, self.heads, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1], (b, 1, self.heads, self.dim_head))

        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)
        k = jnp.concatenate([nk, k], axis=1)
        v = jnp.concatenate([nv, v], axis=1)

        if mask is not None:
            full = jnp.concatenate(
                [jnp.ones((b, 1), bool), mask.astype(bool)], axis=1
            )[:, :, None, None]
            k = jnp.where(full, k, jnp.asarray(-1e9, k.dtype))
            v = jnp.where(full, v, jnp.zeros((), v.dtype))

        q = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * scale
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1)
        ctx = jnp.einsum("blhd,blhe->bhde", k, v.astype(jnp.float32))
        out = jnp.einsum("bnhd,bhde->bnhe", q, ctx).astype(self.dtype)
        out = out.reshape(b, n, inner)
        return nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_out")(out)


class ConvBlock(nn.Module):
    """GroupNorm -> SiLU -> 3x3 conv (the cascade's plain ``Block``,
    imagen_pytorch.py:1498-1540 without FiLM)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(
            num_groups=min(self.groups, x.shape[-1]), dtype=self.dtype, name="gn"
        )(x)
        h = nn.silu(h)
        return nn.Conv(
            self.dim_out, (3, 3), padding=1, dtype=self.dtype, name="conv"
        )(h)


class UpsampleCombiner(nn.Module):
    """Fuse every decoder level's feature map into the final-resolution
    features (imagen_pytorch.py:2278-2345): resize each fmap to the target
    size, run it through a ConvBlock, concat to the trunk."""

    dim: int
    enabled: bool = False
    dim_ins: Sequence[int] = ()
    dim_outs: Sequence[int] | int = ()

    dtype: jnp.dtype = jnp.float32

    @property
    def dim_out(self) -> int:
        if not self.enabled:
            return self.dim
        outs = self._dim_outs()
        return self.dim + sum(outs)

    def _dim_outs(self):
        if isinstance(self.dim_outs, int):
            return [self.dim_outs] * len(self.dim_ins)
        return list(self.dim_outs)

    @nn.compact
    def __call__(self, x: jnp.ndarray, fmaps: Sequence[jnp.ndarray] = ()):
        if not self.enabled or not fmaps or not self.dim_ins:
            return x
        from ...ops.resize import resize_image

        target = x.shape[1]
        outs = []
        for i, (fmap, dim_out) in enumerate(zip(fmaps, self._dim_outs())):
            if fmap.shape[1] != target:
                fmap = resize_image(fmap, target, x.shape[2])
            outs.append(
                ConvBlock(dim_out, dtype=self.dtype, name=f"fmap_conv{i}")(fmap)
            )
        return jnp.concatenate([x, *outs], axis=-1)


__all__ = [
    "PerceiverAttention",
    "PerceiverResampler",
    "CrossEmbedLayer",
    "PixelShuffleUpsample",
    "GlobalContext",
    "CosineSimAttention",
    "LinearAttention",
    "LinearCrossAttention",
    "ConvBlock",
    "UpsampleCombiner",
]
