"""Imagen-style text-conditional UNet, TPU-first.

Rebuild of the cascade's ``Unet`` (CascadedDDPM/imagen_pytorch.py:
2347-3311, ~50 config knobs) with the load-bearing structure:

* continuous noise conditioning: log-SNR scalar -> learned-sinusoidal
  features -> MLP -> (time_cond FiLM vector, time tokens)
  (imagen_pytorch.py:2458-2483);
* separate lowres-noise-level conditioning tower added to both
  (imagen_pytorch.py:2490-2512);
* text conditioning: token projection to cond_dim, attention-pooled
  global vector added to time_cond, learned **null embeddings** swapped
  in per-sample for classifier-free guidance
  (imagen_pytorch.py:2960-3010);
* FiLM ResnetBlocks (GroupNorm -> (scale,shift) -> SiLU -> 3x3 conv,
  imagen_pytorch.py:1498-1540,1552-1650), cross-attention to text tokens
  at configured levels, self-attention TransformerBlocks at coarse levels
  (through the fused flash-attention op);
* channel-concat of the lowres conditioning image and optional cond
  image / self-conditioning (imagen_pytorch.py:2424-2441);
* skip connections with concat, ups/downs by strided conv / resize-conv.

Presets ``base_unet_64`` / ``sr_unet_256`` mirror BaseUnet64/SRUnet256
(imagen_pytorch.py:3231-3283).

Divergences (documented): NHWC layout; the PerceiverResampler text pooler
is replaced by masked attention pooling (same role: text tokens -> fixed
global summary) — a full resampler can drop in behind the same interface.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import attention_core
from ...ops.embeddings import learned_sinusoidal_embedding
from ...ops.resize import resize_image
from .blocks import (
    CrossEmbedLayer,
    GlobalContext,
    LinearAttention,
    LinearCrossAttention,
    PerceiverResampler,
    PixelShuffleUpsample,
    UpsampleCombiner,
    _l2norm,
)


class CrossAttention(nn.Module):
    """Image tokens attend to text tokens (imagen_pytorch.py:1678-1800).

    Mask positions are excluded via a large negative bias; a learned
    null key/value pair guarantees a valid attention target even for
    fully-masked (null) conditioning."""

    n_heads: int = 8
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, S, C) image tokens
        context: jnp.ndarray,  # (B, L, D) text tokens
        mask: Optional[jnp.ndarray] = None,  # (B, L) bool
    ) -> jnp.ndarray:
        b, s, c = x.shape
        inner = self.n_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        null_kv = self.param(
            "null_kv", nn.initializers.normal(0.02), (2, inner), jnp.float32
        ).astype(self.dtype)
        k = jnp.concatenate(
            [jnp.broadcast_to(null_kv[0], (b, 1, inner)), k], axis=1
        )
        v = jnp.concatenate(
            [jnp.broadcast_to(null_kv[1], (b, 1, inner)), v], axis=1
        )

        q = q.reshape(b, s, self.n_heads, self.head_dim)
        k = k.reshape(b, -1, self.n_heads, self.head_dim)
        v = v.reshape(b, -1, self.n_heads, self.head_dim)

        scale = self.head_dim**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if mask is not None:
            full_mask = jnp.concatenate(
                [jnp.ones((b, 1), bool), mask.astype(bool)], axis=1
            )
            logits = jnp.where(
                full_mask[:, None, None, :], logits, jnp.float32(-1e9)
            )
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            q.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, s, inner)
        return nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_out")(out)


class _GNParams(nn.Module):
    """Parameter-only stand-in for ``nn.GroupNorm`` — identical leaves,
    so the fused Pallas path (ops/fused_norm_conv.py) shares checkpoints
    with the unfused block byte-for-byte."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32),
        )


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv(features, (3,3))``."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, cin, self.features), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32),
        )


class ResnetBlock(nn.Module):
    """FiLM resnet block (imagen_pytorch.py:1498-1650): two GroupNorm ->
    (scale,shift) -> SiLU -> conv blocks, residual 1x1, optional
    cross-attention to text tokens."""

    out_channels: int
    cond_dim: Optional[int] = None  # enables cross-attention
    time_cond_dim: Optional[int] = None
    groups: int = 8
    use_global_context: bool = False
    # O(N) cross-attention variant (imagen_pytorch.py:1807-1880) selected
    # by the Unet's use_linear_cross_attn knob
    linear_cross_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    # Serving-only dynamic-int8 compute for the >=128-channel 3x3 convs
    # (ops/quantized_conv.py: 186 vs 127 TF/s on the v5e int8 MXU path).
    # Identical parameter tree; approximate — keep False for training.
    conv_quant: bool = False
    # Fused GN+FiLM+SiLU+conv3x3 Pallas kernel for the narrow (<=64ch)
    # maps — the SR stage's full-resolution level (ops/fused_norm_conv.py,
    # probe: scripts/probe_fused_conv_r4.py --sr). Identical parameter
    # tree (param-only stand-ins below); opt-in.
    fused_narrow: bool = False

    def _fuse_ok(self, cin: int, x: jnp.ndarray) -> bool:
        return (
            self.fused_narrow
            and not self.conv_quant
            and max(cin, self.out_channels) <= 64
            and cin % min(self.groups, cin) == 0
            and x.shape[2] % 2 == 0
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time_emb: Optional[jnp.ndarray] = None,
        context: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        from ...ops.fused_norm_conv import fused_gn_silu_conv

        scale_shift = None
        if time_emb is not None:
            h_t = nn.silu(time_emb)
            h_t = nn.Dense(
                2 * self.out_channels, dtype=self.dtype, name="time_mlp"
            )(h_t)
            scale, shift = jnp.split(h_t[:, None, None, :], 2, axis=-1)
            scale_shift = (scale, shift)

        def block(h, use_film, name):
            cin = h.shape[-1]
            if self._fuse_ok(cin, h):
                gamma, beta = _GNParams(cin, name=f"{name}_gn")()
                kernel, cbias = _ConvParams(
                    self.out_channels, name=f"{name}_conv"
                )(cin)
                film = use_film and scale_shift is not None
                # FiLM operates on the POST-norm map whose width is Cout
                # == Cin at fused sites (same-channel blocks only)
                fs = (scale_shift[0][:, 0, 0, :] if film else None)
                fh = (scale_shift[1][:, 0, 0, :] if film else None)
                return fused_gn_silu_conv(
                    h.astype(self.dtype), kernel.astype(self.dtype),
                    gamma, beta, cbias,
                    groups=min(self.groups, cin),
                    film_scale=fs, film_shift=fh,
                )
            h = nn.GroupNorm(
                num_groups=min(self.groups, h.shape[-1]),
                dtype=self.dtype,
                name=f"{name}_gn",
            )(h)
            if use_film and scale_shift is not None:
                h = h * (scale_shift[0] + 1.0) + scale_shift[1]
            h = nn.silu(h)
            if (
                self.conv_quant
                and h.shape[-1] >= 128
                and self.out_channels >= 128
            ):
                from ...ops.quantized_conv import DynamicInt8Conv3x3

                return DynamicInt8Conv3x3(
                    self.out_channels,
                    dtype=self.dtype,
                    use_bias=True,
                    name=f"{name}_conv",
                )(h)
            return nn.Conv(
                self.out_channels,
                (3, 3),
                padding=1,
                dtype=self.dtype,
                name=f"{name}_conv",
            )(h)

        h = block(x, use_film=False, name="block1")

        if context is not None and self.cond_dim is not None:
            b, hh, ww, cc = h.shape
            tokens = h.reshape(b, hh * ww, cc)
            if self.linear_cross_attn:
                tokens = tokens + LinearCrossAttention(
                    dtype=self.dtype, name="cross_attn"
                )(tokens, context, context_mask)
            else:
                tokens = tokens + CrossAttention(
                    dtype=self.dtype, name="cross_attn"
                )(
                    nn.LayerNorm(dtype=self.dtype, name="cross_ln")(tokens),
                    context,
                    context_mask,
                )
            h = tokens.reshape(b, hh, ww, cc)

        h = block(h, use_film=True, name="block2")

        if self.use_global_context:
            h = h * GlobalContext(
                self.out_channels, dtype=self.dtype, name="global_context"
            )(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="res_conv"
            )(x)
        return h + x


class TransformerBlock(nn.Module):
    """Self-attention + FF over image tokens (imagen_pytorch.py:2103-2165).

    ``depth`` stacks (attn, ff) pairs (the reference's layer_attns_depth /
    layer_mid_attns_depth knobs, imagen_pytorch.py:2368-2369,2680).

    ``cosine_sim_attn`` switches to the cascade Attention's QK treatment
    (imagen_pytorch.py:1264-1270): l2-normalize q and k per head, apply
    learnable per-dim scales, use a fixed logit scale (8). Realized by
    pre-scaling q so the flash kernel's 1/sqrt(d) yields exactly 8.

    With ``context`` (the reference's layer_attns_add_text_cond pathway,
    imagen_pytorch.py:2370 + Attention.to_context at :1214), extra
    key/value pairs are projected from the time+text context tokens and
    broadcast across heads (the reference shares a single kv head for
    context — multi-query style). Context attention routes through the
    einsum path (kv length differs from q; the flash kernel assumes
    square blocks)."""

    n_heads: int = 8
    head_dim: Optional[int] = None  # None -> c // n_heads (min 16)
    ff_mult: int = 2
    depth: int = 1
    cosine_sim_attn: bool = False
    cosine_sim_scale: float = 8.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        head_dim = self.head_dim or max(c // self.n_heads, 16)
        inner = head_dim * self.n_heads

        for layer in range(self.depth):
            # layer-0 param names stay unsuffixed for checkpoint
            # compatibility with the depth=1 builds of earlier rounds
            sfx = "" if layer == 0 else f"_d{layer}"
            normed = nn.LayerNorm(dtype=self.dtype, name=f"attn_ln{sfx}")(tokens)
            qkv = nn.Dense(
                3 * inner, use_bias=False, dtype=self.dtype, name=f"qkv{sfx}"
            )(normed)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            reshape = lambda t: t.reshape(b, h * w, self.n_heads, head_dim)
            q, k, v = reshape(q), reshape(k), reshape(v)
            if context is not None:
                # single shared kv head from context, broadcast over heads
                # (imagen_pytorch.py:1214,1244-1250)
                ckv = nn.Dense(
                    2 * head_dim,
                    dtype=self.dtype,
                    name=f"to_context{sfx}",
                )(nn.LayerNorm(dtype=self.dtype, name=f"ctx_ln{sfx}")(context))
                ck, cv = jnp.split(ckv, 2, axis=-1)
                ck = jnp.broadcast_to(
                    ck[:, :, None, :], (b, ck.shape[1], self.n_heads, head_dim)
                )
                cv = jnp.broadcast_to(
                    cv[:, :, None, :], (b, cv.shape[1], self.n_heads, head_dim)
                )
                k = jnp.concatenate([ck, k], axis=1)
                v = jnp.concatenate([cv, v], axis=1)
            if self.cosine_sim_attn:
                q_scale = self.param(
                    f"q_scale{sfx}", nn.initializers.ones, (head_dim,), jnp.float32
                ).astype(self.dtype)
                k_scale = self.param(
                    f"k_scale{sfx}", nn.initializers.ones, (head_dim,), jnp.float32
                ).astype(self.dtype)
                q = _l2norm(q) * q_scale
                k = _l2norm(k) * k_scale
                # attention_core divides by sqrt(head_dim); fold in scale*sqrt(d)
                q = q * (self.cosine_sim_scale * head_dim**0.5)
            out = attention_core(
                q, k, v, use_flash=False if context is not None else None
            )
            out = nn.Dense(
                c, use_bias=False, dtype=self.dtype, name=f"attn_out{sfx}"
            )(out.reshape(b, h * w, inner))
            tokens = tokens + out
            ff = nn.LayerNorm(dtype=self.dtype, name=f"ff_ln{sfx}")(tokens)
            # int(): the reference default ff_mult is the FLOAT 2.
            # (imagen_video.py:1245), and widths must be concrete ints
            ff = nn.Dense(
                int(c * self.ff_mult), dtype=self.dtype, name=f"ff1{sfx}"
            )(ff)
            ff = nn.gelu(ff)
            ff = nn.Dense(c, dtype=self.dtype, name=f"ff2{sfx}")(ff)
            tokens = tokens + ff
        return tokens.reshape(b, h, w, c)


def _attention_pool(
    tokens: jnp.ndarray, mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Masked mean pooling over text tokens (PerceiverResampler stand-in,
    imagen_pytorch.py:1068-1170 role)."""
    if mask is None:
        return tokens.mean(axis=1)
    m = mask.astype(tokens.dtype)[..., None]
    return (tokens * m).sum(axis=1) / jnp.clip(m.sum(axis=1), 1.0, None)


class ImagenUNet(nn.Module):
    """Text/lowres-conditional UNet for one cascade stage."""

    dim: int = 128
    dim_mults: Sequence[int] = (1, 2, 4)
    channels: int = 3
    channels_out: Optional[int] = None  # defaults to channels
    cond_dim: Optional[int] = None  # defaults to dim
    text_embed_dim: int = 768
    cond_on_text: bool = True
    num_resnet_blocks: int | Sequence[int] = 2
    layer_attns: Sequence[bool] = (False, True, True)
    layer_cross_attns: Sequence[bool] = (False, True, True)
    attn_heads: int = 8
    attn_dim_head: int = 64  # imagen Attention dim_head default
    ff_mult: int = 2  # transformer FF expansion (imagen_pytorch.py:2103)
    # stacked (attn, ff) depth per attended level / at the bottleneck
    # (imagen_pytorch.py:2368-2369)
    layer_attns_depth: int | Sequence[int] = 1
    layer_mid_attns_depth: int = 1
    # feed the time+text context tokens into the self-attention blocks as
    # extra kv (Imagen appendix D.3.1; imagen_pytorch.py:2370)
    layer_attns_add_text_cond: bool = True
    # attention at the bottleneck (off for high-res SR stages, :2371,2680)
    attend_at_middle: bool = True
    resnet_groups: int = 8  # GroupNorm groups in resnet blocks
    init_dim: Optional[int] = None  # init conv width, defaults to dim (:2426)
    init_conv_kernel_size: int = 7  # init conv kernel (:2418)
    final_conv_kernel_size: int = 3  # output head kernel (:2392,2750)
    # resize method for in-net conditioning-image resizes (:2394,2967)
    resize_mode: str = "nearest"
    # accepted for reference config compatibility; BOTH are dead knobs in
    # the reference too: `num_image_tokens` (imagen_pytorch.py:2355) and
    # `dropout` (:2386) are defined in Unet.__init__ and never consumed.
    num_image_tokens: int = 4
    dropout: float = 0.0
    # extra full-width resnet block before the final conv (:3165-3180)
    final_resnet_block: bool = True
    # concat the init-conv features into the final conv input (:3162)
    init_conv_to_final_conv_residual: bool = False
    # O(N) attention at levels without full attention / full cross-attn
    # (imagen_pytorch.py:1807,1881; Unet knobs use_linear_attn/
    # use_linear_cross_attn around :2370)
    use_linear_attn: bool | Sequence[bool] = False
    use_linear_cross_attn: bool | Sequence[bool] = False
    # cosine-sim QK-normalized attention (imagen_pytorch.py:1171)
    cosine_sim_attn: bool = False
    # Serving-only: dynamic-int8 compute for the >=128-channel resnet
    # convs (ops/quantized_conv.py). Approximate; same parameter tree —
    # trained checkpoints load either way. Keep False for training
    # (differentiating through it raises). Beyond-reference knob.
    conv_quant: bool = False
    # Fused GN+FiLM+SiLU+conv Pallas kernel for the narrow (<=64ch)
    # resnet maps (ops/fused_norm_conv.py) — the SR stage's full-res
    # level. Identical parameter tree; opt-in. Beyond-reference knob.
    fused_narrow: bool = False
    # skip concat scaled by 2^-0.5 (imagen_pytorch.py:2602,3146;
    # reference default is True, :2390)
    scale_skip_connection: bool = True
    # fuse all decoder-level fmaps at the final resolution
    # (UpsampleCombiner, imagen_pytorch.py:2278,3155-3160)
    combine_upsample_fmaps: bool = False
    lowres_cond: bool = False  # super-res stages concat the lowres image
    cond_images_channels: int = 0
    self_cond: bool = False
    learned_sinu_dim: int = 16
    num_time_tokens: int = 2  # time tokens in the context (:2356,2475)
    max_text_len: int = 256
    # text pooling: 'perceiver' (PerceiverResampler,
    # imagen_pytorch.py:1068-1170) or 'attention_pool' (masked mean).
    # Default matches the reference Unet's attn_pool_text=True default
    # (imagen_pytorch.py:2384,2532) so unset configs reproduce reference
    # pooling; checkpoints saved before round 3 with the old
    # 'attention_pool' default must now set text_pool explicitly.
    text_pool: str = "perceiver"
    num_latents: int = 32
    # multi-kernel stem (CrossEmbedLayer, imagen_pytorch.py:2220) vs 7x7 conv
    use_cross_embed: bool = False
    init_cross_embed_kernel_sizes: Sequence[int] = (3, 7, 15)
    # downsample with a stride-2 CrossEmbedLayer instead of a strided conv
    # (imagen_pytorch.py cross_embed_downsample + :2220)
    cross_embed_downsample: bool = False
    cross_embed_downsample_kernel_sizes: Sequence[int] = (2, 4)
    # anti-checkerboard pixel-shuffle upsampling (imagen_pytorch.py:1320)
    pixel_shuffle_upsample: bool = True
    # squeeze-excite global context gating in resnet blocks
    use_global_context: bool = False
    # gradient checkpointing of resnet blocks (the reference's
    # memory_efficient flag, imagen_pytorch.py:2388) -> jax.checkpoint
    memory_efficient: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, C) noisy image
        noise_cond: jnp.ndarray,  # (B,) log-SNR condition
        *,
        text_embeds: Optional[jnp.ndarray] = None,  # (B, L, text_embed_dim)
        text_mask: Optional[jnp.ndarray] = None,  # (B, L)
        cond_drop_mask: Optional[jnp.ndarray] = None,  # (B,) True -> drop text
        lowres_cond_img: Optional[jnp.ndarray] = None,  # (B, H, W, C)
        lowres_noise_cond: Optional[jnp.ndarray] = None,  # (B,)
        cond_images: Optional[jnp.ndarray] = None,
        self_cond: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        del train
        b, h_in, w_in, _ = x.shape
        in_dtype = x.dtype
        cond_dim = self.cond_dim or self.dim
        time_cond_dim = self.dim * 4

        # ---- channel concat of conditioning images ----------------------
        parts = [x.astype(self.dtype)]
        lowres_for_head = None  # re-concatenated before final_conv (:3186)
        if self.lowres_cond:
            lr = (
                jnp.zeros_like(x)
                if lowres_cond_img is None
                else lowres_cond_img.astype(x.dtype)
            )
            if lr.shape[1:3] != (h_in, w_in):
                lr = resize_image(lr, h_in, w_in)
            lowres_for_head = lr.astype(self.dtype)
            parts.append(lowres_for_head)
        if self.self_cond:
            sc = jnp.zeros_like(x) if self_cond is None else self_cond
            parts.append(sc.astype(self.dtype))
        if self.cond_images_channels:
            ci = (
                jnp.zeros((b, h_in, w_in, self.cond_images_channels), self.dtype)
                if cond_images is None
                else cond_images.astype(self.dtype)
            )
            if ci.shape[1:3] != (h_in, w_in):
                ci = resize_image(ci, h_in, w_in, method=self.resize_mode)
            parts.append(ci)
        h = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

        # ---- time conditioning (imagen_pytorch.py:2458-2483) ------------
        sinu_w = self.param(
            "sinu_freqs",
            nn.initializers.normal(1.0),
            (self.learned_sinu_dim // 2,),
            jnp.float32,
        )
        t_feat = learned_sinusoidal_embedding(noise_cond, sinu_w).astype(self.dtype)
        t_hid = nn.Dense(time_cond_dim, dtype=self.dtype, name="time_mlp1")(t_feat)
        t_hid = nn.silu(t_hid)
        time_cond = nn.Dense(time_cond_dim, dtype=self.dtype, name="time_mlp2")(
            t_hid
        )
        n_time_tokens = self.num_time_tokens
        time_tokens = nn.Dense(
            cond_dim * n_time_tokens, dtype=self.dtype, name="to_time_tokens"
        )(t_hid).reshape(b, n_time_tokens, cond_dim)

        # lowres aug-noise tower (imagen_pytorch.py:2490-2512)
        if self.lowres_cond:
            lr_noise = (
                jnp.zeros((b,), jnp.float32)
                if lowres_noise_cond is None
                else lowres_noise_cond
            )
            lr_sinu_w = self.param(
                "lowres_sinu_freqs",
                nn.initializers.normal(1.0),
                (self.learned_sinu_dim // 2,),
                jnp.float32,
            )
            lr_feat = learned_sinusoidal_embedding(lr_noise, lr_sinu_w).astype(
                self.dtype
            )
            lr_hid = nn.Dense(
                time_cond_dim, dtype=self.dtype, name="lowres_time_mlp1"
            )(lr_feat)
            lr_hid = nn.silu(lr_hid)
            time_cond = time_cond + nn.Dense(
                time_cond_dim, dtype=self.dtype, name="lowres_time_mlp2"
            )(lr_hid)

        # ---- text conditioning with CFG null embedding ------------------
        if not self.cond_on_text:
            text_embeds = None
        context = None
        if text_embeds is not None:
            text_tokens = nn.Dense(
                cond_dim, dtype=self.dtype, name="text_to_cond"
            )(text_embeds.astype(self.dtype))
            null_text = self.param(
                "null_text_embed",
                nn.initializers.normal(0.02),
                (self.max_text_len, cond_dim),
                jnp.float32,
            )
            null_hidden = self.param(
                "null_text_hidden",
                nn.initializers.normal(0.02),
                (time_cond_dim,),
                jnp.float32,
            )
            ln = text_tokens.shape[1]
            if cond_drop_mask is not None:
                keep = (~cond_drop_mask).astype(self.dtype).reshape(b, 1, 1)
                text_tokens = text_tokens * keep + null_text[None, :ln].astype(
                    self.dtype
                ) * (1 - keep)
            if self.text_pool == "perceiver":
                resampled = PerceiverResampler(
                    depth=2,
                    num_latents=self.num_latents,
                    dtype=self.dtype,
                    name="perceiver",
                )(text_tokens, text_mask)
                pooled = resampled.mean(axis=1)
                # resampled latents replace raw tokens as attention context
                text_tokens = resampled
                text_mask = None
            else:
                pooled = _attention_pool(text_tokens, text_mask)
            pooled_hidden = nn.silu(
                nn.LayerNorm(dtype=self.dtype, name="text_hid_ln")(
                    nn.Dense(
                        time_cond_dim, dtype=self.dtype, name="text_to_hidden"
                    )(pooled)
                )
            )
            if cond_drop_mask is not None:
                keep1 = (~cond_drop_mask).astype(self.dtype).reshape(b, 1)
                pooled_hidden = pooled_hidden * keep1 + null_hidden[None].astype(
                    self.dtype
                ) * (1 - keep1)
            time_cond = time_cond + pooled_hidden
            context = jnp.concatenate([time_tokens, text_tokens], axis=1)
            context = nn.LayerNorm(dtype=self.dtype, name="context_ln")(context)
            if text_mask is not None:
                context_mask = jnp.concatenate(
                    [jnp.ones((b, n_time_tokens), bool), text_mask.astype(bool)],
                    axis=1,
                )
                if cond_drop_mask is not None:
                    # null tokens are always attendable
                    context_mask = jnp.where(
                        cond_drop_mask[:, None], True, context_mask
                    )
            else:
                context_mask = None
        else:
            context = nn.LayerNorm(dtype=self.dtype, name="context_ln")(time_tokens)
            context_mask = None

        # ---- UNet trunk --------------------------------------------------
        ResBlock = (
            nn.remat(ResnetBlock, static_argnums=())
            if self.memory_efficient
            else ResnetBlock
        )
        dims = [self.dim * m for m in self.dim_mults]
        n_levels = len(dims)
        n_blocks = (
            [self.num_resnet_blocks] * n_levels
            if isinstance(self.num_resnet_blocks, int)
            else list(self.num_resnet_blocks)
        )

        def per_level(flag):
            return (
                [flag] * n_levels
                if isinstance(flag, (bool, int))
                else list(flag)
            )

        layer_attns = per_level(self.layer_attns)
        layer_cross_attns = per_level(self.layer_cross_attns)
        attn_depths = per_level(self.layer_attns_depth)
        linear_attns = per_level(self.use_linear_attn)
        linear_cross = per_level(self.use_linear_cross_attn)
        skip_scale = 2**-0.5 if self.scale_skip_connection else 1.0
        # context fed to self-attention blocks (appendix D.3.1 pathway)
        attn_context = context if self.layer_attns_add_text_cond else None

        init_width = self.init_dim or dims[0]
        if self.use_cross_embed:
            h = CrossEmbedLayer(
                init_width,
                kernel_sizes=tuple(self.init_cross_embed_kernel_sizes),
                dtype=self.dtype,
                name="init_cross_embed",
            )(h)
        else:
            ks = self.init_conv_kernel_size
            h = nn.Conv(
                init_width, (ks, ks), padding=ks // 2, dtype=self.dtype,
                name="init_conv",
            )(h)
        init_feats = h if self.init_conv_to_final_conv_residual else None

        skips = []
        for lvl in range(n_levels):
            use_cross = layer_cross_attns[lvl]
            use_lin_cross = not use_cross and linear_cross[lvl]
            for bi in range(n_blocks[lvl]):
                h = ResBlock(
                    dims[lvl],
                    cond_dim=cond_dim if (use_cross or use_lin_cross) else None,
                    time_cond_dim=time_cond_dim,
                    groups=self.resnet_groups,
                    use_global_context=self.use_global_context,
                    linear_cross_attn=use_lin_cross,
                    dtype=self.dtype,
                    conv_quant=self.conv_quant,
                    fused_narrow=self.fused_narrow,
                    name=f"down_{lvl}_res{bi}",
                )(
                    h,
                    time_cond,
                    context if (use_cross or use_lin_cross) else None,
                    context_mask if (use_cross or use_lin_cross) else None,
                )
            if layer_attns[lvl]:
                h = TransformerBlock(
                    n_heads=self.attn_heads,
                    head_dim=self.attn_dim_head,
                    ff_mult=self.ff_mult,
                    depth=attn_depths[lvl],
                    cosine_sim_attn=self.cosine_sim_attn,
                    dtype=self.dtype,
                    name=f"down_{lvl}_attn",
                )(h, attn_context)
            elif linear_attns[lvl]:
                h = h + LinearAttention(
                    dtype=self.dtype, name=f"down_{lvl}_linattn"
                )(h)
            skips.append(h)
            if lvl < n_levels - 1:
                if self.cross_embed_downsample:
                    h = CrossEmbedLayer(
                        dims[lvl + 1],
                        kernel_sizes=tuple(self.cross_embed_downsample_kernel_sizes),
                        stride=2,
                        dtype=self.dtype,
                        name=f"down_{lvl}_downsample",
                    )(h)
                else:
                    h = nn.Conv(
                        dims[lvl + 1],
                        (4, 4),
                        strides=2,
                        padding=1,
                        dtype=self.dtype,
                        name=f"down_{lvl}_downsample",
                    )(h)

        # mid (always cross-attends when text is present)
        h = ResnetBlock(
            dims[-1],
            cond_dim=cond_dim,
            time_cond_dim=time_cond_dim,
            dtype=self.dtype,
            conv_quant=self.conv_quant,
            fused_narrow=self.fused_narrow,
            name="mid_res1",
        )(h, time_cond, context, context_mask)
        if self.attend_at_middle:
            h = TransformerBlock(
                n_heads=self.attn_heads,
                head_dim=self.attn_dim_head,
                ff_mult=self.ff_mult,
                depth=self.layer_mid_attns_depth,
                cosine_sim_attn=self.cosine_sim_attn,
                dtype=self.dtype,
                name="mid_attn",
            )(h, attn_context)
        h = ResnetBlock(
            dims[-1],
            cond_dim=cond_dim,
            time_cond_dim=time_cond_dim,
            dtype=self.dtype,
            conv_quant=self.conv_quant,
            fused_narrow=self.fused_narrow,
            name="mid_res2",
        )(h, time_cond, context, context_mask)

        up_hiddens = []
        for lvl in reversed(range(n_levels)):
            use_cross = layer_cross_attns[lvl]
            use_lin_cross = not use_cross and linear_cross[lvl]
            if lvl < n_levels - 1:
                if self.pixel_shuffle_upsample:
                    h = PixelShuffleUpsample(
                        dims[lvl], dtype=self.dtype, name=f"up_{lvl}_pixelshuffle"
                    )(h)
                else:
                    b_, hh, ww, _ = h.shape
                    h = resize_image(h, hh * 2, ww * 2, method=self.resize_mode)
                    h = nn.Conv(
                        dims[lvl],
                        (3, 3),
                        padding=1,
                        dtype=self.dtype,
                        name=f"up_{lvl}_upsample",
                    )(h)
            h = jnp.concatenate([h, skips[lvl] * skip_scale], axis=-1)
            for bi in range(n_blocks[lvl]):
                h = ResBlock(
                    dims[lvl],
                    cond_dim=cond_dim if (use_cross or use_lin_cross) else None,
                    time_cond_dim=time_cond_dim,
                    groups=self.resnet_groups,
                    use_global_context=self.use_global_context,
                    linear_cross_attn=use_lin_cross,
                    dtype=self.dtype,
                    conv_quant=self.conv_quant,
                    fused_narrow=self.fused_narrow,
                    name=f"up_{lvl}_res{bi}",
                )(
                    h,
                    time_cond,
                    context if (use_cross or use_lin_cross) else None,
                    context_mask if (use_cross or use_lin_cross) else None,
                )
            if layer_attns[lvl]:
                h = TransformerBlock(
                    n_heads=self.attn_heads,
                    head_dim=self.attn_dim_head,
                    ff_mult=self.ff_mult,
                    depth=attn_depths[lvl],
                    cosine_sim_attn=self.cosine_sim_attn,
                    dtype=self.dtype,
                    name=f"up_{lvl}_attn",
                )(h, attn_context)
            elif linear_attns[lvl]:
                h = h + LinearAttention(
                    dtype=self.dtype, name=f"up_{lvl}_linattn"
                )(h)
            up_hiddens.append(h)

        if self.combine_upsample_fmaps:
            # ALL decoder-level fmaps feed the combiner, including the
            # full-res one (the reference appends every level's map before
            # its upsample and passes the whole list, imagen_pytorch.py:
            # 3171-3175 + upsample_fmap_dims at :2715)
            h = UpsampleCombiner(
                dim=dims[0],
                enabled=True,
                dim_ins=tuple(x.shape[-1] for x in up_hiddens),
                dim_outs=self.dim,
                dtype=self.dtype,
                name="upsample_combiner",
            )(h, up_hiddens)

        if init_feats is not None:
            h = jnp.concatenate([h, init_feats], axis=-1)
        if self.final_resnet_block:
            h = ResnetBlock(
                dims[0],
                time_cond_dim=time_cond_dim,
                groups=self.resnet_groups,
                dtype=self.dtype,
                conv_quant=self.conv_quant,
                fused_narrow=self.fused_narrow,
                name="final_res_block",
            )(h, time_cond)
        if lowres_for_head is not None:
            # SR stages re-concatenate the lowres conditioning image at the
            # output head (imagen_pytorch.py:3186)
            h = jnp.concatenate([h, lowres_for_head], axis=-1)

        fk = self.final_conv_kernel_size
        out = nn.Conv(
            self.channels_out or self.channels,
            (fk, fk),
            padding=fk // 2,
            dtype=jnp.float32,
            name="final_conv",
        )(h.astype(jnp.float32))
        return out.astype(in_dtype)

    def cast_model_parameters(
        self,
        *,
        lowres_cond: bool,
        text_embed_dim: int,
        channels: int,
        channels_out: Optional[int],
        cond_on_text: bool,
    ) -> "ImagenUNet":
        """Return this unet re-configured for a different cascade slot
        (imagen_pytorch.py:2760-2803): identity when nothing changes,
        otherwise a clone with the new conditioning surface."""
        if (
            lowres_cond == self.lowres_cond
            and text_embed_dim == self.text_embed_dim
            and channels == self.channels
            and channels_out == self.channels_out
            and cond_on_text == self.cond_on_text
        ):
            return self
        return self.clone(
            lowres_cond=lowres_cond,
            text_embed_dim=text_embed_dim,
            channels=channels,
            channels_out=channels_out,
            cond_on_text=cond_on_text,
        )


# Reference Unet.__init__ kwarg -> ImagenUNet field. Every knob of
# imagen_pytorch.py:2349-2398 is either mapped, identical, or documented
# as dead in the reference itself (value None below = accepted, ignored).
_REF_KNOB_MAP = {
    "dim": "dim",
    "text_embed_dim": "text_embed_dim",
    "num_resnet_blocks": "num_resnet_blocks",
    "cond_dim": "cond_dim",
    "num_image_tokens": "num_image_tokens",  # dead in reference (:2355)
    "num_time_tokens": "num_time_tokens",
    "learned_sinu_pos_emb_dim": "learned_sinu_dim",
    "out_dim": "channels_out",
    "dim_mults": "dim_mults",
    "cond_images_channels": "cond_images_channels",
    "channels": "channels",
    "channels_out": "channels_out",
    "attn_dim_head": "attn_dim_head",
    "attn_heads": "attn_heads",
    "ff_mult": "ff_mult",
    "lowres_cond": "lowres_cond",
    "layer_attns": "layer_attns",
    "layer_attns_depth": "layer_attns_depth",
    "layer_mid_attns_depth": "layer_mid_attns_depth",
    "layer_attns_add_text_cond": "layer_attns_add_text_cond",
    "attend_at_middle": "attend_at_middle",
    "layer_cross_attns": "layer_cross_attns",
    "use_linear_attn": "use_linear_attn",
    "use_linear_cross_attn": "use_linear_cross_attn",
    "cond_on_text": "cond_on_text",
    "max_text_len": "max_text_len",
    "init_dim": "init_dim",
    "resnet_groups": "resnet_groups",
    "init_conv_kernel_size": "init_conv_kernel_size",
    "init_cross_embed": "use_cross_embed",
    "init_cross_embed_kernel_sizes": "init_cross_embed_kernel_sizes",
    "cross_embed_downsample": "cross_embed_downsample",
    "cross_embed_downsample_kernel_sizes": "cross_embed_downsample_kernel_sizes",
    "attn_pool_text": None,  # special-cased below -> text_pool
    "attn_pool_num_latents": "num_latents",
    "dropout": "dropout",  # dead in reference (:2386)
    "memory_efficient": "memory_efficient",
    "init_conv_to_final_conv_residual": "init_conv_to_final_conv_residual",
    "use_global_context_attn": "use_global_context",
    "scale_skip_connection": "scale_skip_connection",
    "final_resnet_block": "final_resnet_block",
    "final_conv_kernel_size": "final_conv_kernel_size",
    "self_cond": "self_cond",
    "resize_mode": "resize_mode",
    "combine_upsample_fmaps": "combine_upsample_fmaps",
    "pixel_shuffle_upsample": "pixel_shuffle_upsample",
    # knobs that already use our native names (kept by identity above) plus
    # our extras (cosine_sim_attn, text_pool, num_latents, dtype) pass
    # through unchanged when supplied.
}


def imagen_unet_from_ref_config(knobs: dict, **overrides) -> ImagenUNet:
    """Build an :class:`ImagenUNet` from a reference-named kwarg dict.

    Accepts the full Unet knob surface of imagen_pytorch.py:2349-2398
    (e.g. a ``unets[i]`` entry of default_config.json) plus this module's
    native field names; ``overrides`` win over ``knobs``.
    """
    field_names = {f for f in ImagenUNet.__dataclass_fields__}
    kw: dict = {}
    for key, val in knobs.items():
        if key == "attn_pool_text":
            kw["text_pool"] = "perceiver" if val else "attention_pool"
            continue
        target = _REF_KNOB_MAP.get(key, key if key in field_names else None)
        if target is None and key not in _REF_KNOB_MAP:
            raise TypeError(f"unknown Unet knob {key!r}")
        if target is not None:
            kw[target] = tuple(val) if isinstance(val, list) else val
    kw.update(overrides)
    return ImagenUNet(**kw)


def base_unet_64(**overrides) -> ImagenUNet:
    """BaseUnet64 preset (imagen_pytorch.py:3231-3257)."""
    kw = dict(
        dim=512,
        dim_mults=(1, 2, 3, 4),
        num_resnet_blocks=3,
        layer_attns=(False, True, True, True),
        layer_cross_attns=(False, True, True, True),
        attn_heads=8,
    )
    kw.update(overrides)
    return ImagenUNet(**kw)


def sr_unet_256(**overrides) -> ImagenUNet:
    """SRUnet256 preset (imagen_pytorch.py:3258-3283)."""
    kw = dict(
        dim=128,
        dim_mults=(1, 2, 4, 8),
        num_resnet_blocks=(2, 4, 8, 8),
        layer_attns=(False, False, False, True),
        layer_cross_attns=(False, False, False, True),
        attn_heads=8,
        lowres_cond=True,
    )
    kw.update(overrides)
    return ImagenUNet(**kw)


class NullUnet:
    """Placeholder stage (imagen_pytorch.py:3193-3230): passes images
    through unchanged; used to skip already-trained cascade stages."""

    lowres_cond = False

    def init(self, *a, **k):
        return {"params": {}}

    def apply(self, variables, x, *a, **k):
        return x

    def cast_model_parameters(self, *a, **k):
        return self  # imagen_pytorch.py:3215-3220


__all__ = [
    "ImagenUNet",
    "ResnetBlock",
    "TransformerBlock",
    "CrossAttention",
    "NullUnet",
    "base_unet_64",
    "sr_unet_256",
    "imagen_unet_from_ref_config",
]
