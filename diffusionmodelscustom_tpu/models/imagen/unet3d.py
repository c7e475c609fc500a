"""Video UNet (Unet3D): factorized space/time diffusion backbone.

Rebuild of the cascade's video variant (CascadedDDPM/imagen_video.py,
~1900 LoC): spatial processing reuses the 2-D Imagen blocks with frames
folded into the batch axis, interleaved with

* temporal convolutions — 1-D convs over the frame axis
  (imagen_video.py:393-440's Conv3d temporal kernels), and
* temporal attention — per-pixel attention across frames
  (imagen_video.py:253-320's time-centric rearrange + attention),

exactly the factorization the reference uses. Enables
``Imagen(video=True)`` (imagen_pytorch.py's is_video pathway).

Layout: (B, F, H, W, C) channel-last video batches.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.embeddings import learned_sinusoidal_embedding
from ...ops.resize import resize_image
from .unet import ResnetBlock, TransformerBlock, _attention_pool


def resize_video_to(
    x: jnp.ndarray, height: int, width: int, method: str = "nearest"
) -> jnp.ndarray:
    """Spatial resize of a (B, F, H, W, C) video batch, reference-named
    wrapper (imagen_video.py:139-160) over ops.resize.resize_video."""
    from ...ops.resize import resize_video

    return resize_video(x, x.shape[1], height, width, method=method)


def scale_video_time(
    x: jnp.ndarray, frames: int, method: str = "nearest"
) -> jnp.ndarray:
    """Resample the frame axis of a (B, F, H, W, C) video to ``frames``
    (imagen_video.py:163-184's scale_video_time): used between cascade
    stages with different temporal downsample factors."""
    from ...ops.resize import resize_video

    return resize_video(x, frames, x.shape[2], x.shape[3], method=method)


def fold_frames(x: jnp.ndarray):
    """(B, F, H, W, C) -> (B*F, H, W, C)."""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c), (b, f)


def unfold_frames(x: jnp.ndarray, bf) -> jnp.ndarray:
    b, f = bf
    return x.reshape(b, f, *x.shape[1:])


class TemporalConv(nn.Module):
    """1-D conv over the frame axis per pixel (imagen_video.py:393-440).

    Identity-initialized output projection so a freshly-added temporal
    layer doesn't perturb pretrained spatial behavior (the reference
    zero-inits its temporal convs for the same reason)."""

    channels: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        tokens = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        out = nn.Conv(
            self.channels,
            (self.kernel,),
            padding=self.kernel // 2,
            dtype=self.dtype,
            name="conv",
        )(tokens)
        out = nn.Conv(
            self.channels,
            (1,),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj_out",
        )(nn.silu(out))
        out = out.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return x + out


class DynamicPositionBias(nn.Module):
    """Continuous relative-position bias over frame distance
    (imagen_video.py:1180-1221): a small MLP maps the signed frame offset
    to one bias per head; gathered into an (H, F, F) attention bias."""

    dim: int
    heads: int
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, n: int) -> jnp.ndarray:
        pos = jnp.arange(-n + 1, n, dtype=jnp.float32)[:, None]  # (2n-1, 1)
        h = nn.Dense(self.dim, dtype=self.dtype, name="in_proj")(pos)
        h = nn.silu(nn.LayerNorm(dtype=self.dtype, name="in_ln")(h))
        for d in range(max(self.depth - 1, 0)):
            h = nn.Dense(self.dim, dtype=self.dtype, name=f"mid_proj{d}")(h)
            h = nn.silu(nn.LayerNorm(dtype=self.dtype, name=f"mid_ln{d}")(h))
        bias = nn.Dense(self.heads, dtype=self.dtype, name="out_proj")(h)
        i = jnp.arange(n)
        indices = i[:, None] - i[None, :] + (n - 1)  # (F, F) into 2n-1
        return bias[indices].transpose(2, 0, 1)  # (H, F, F)


class TemporalAttention(nn.Module):
    """Attention across frames for each spatial position
    (imagen_video.py:253-320,1415). Zero-initialized output projection;
    ``rel_pos_bias`` adds the reference's DynamicPositionBias (the
    temporal_attn lambda always enables it, imagen_video.py:1415)."""

    n_heads: int = 4
    rel_pos_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        head_dim = max(c // self.n_heads, 8)
        inner = head_dim * self.n_heads
        tokens = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        normed = nn.LayerNorm(dtype=self.dtype, name="ln")(tokens)
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype, name="qkv")(
            normed
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(-1, f, self.n_heads, head_dim)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", reshape(q), reshape(k)
        ) * head_dim**-0.5
        if self.rel_pos_bias:
            bias = DynamicPositionBias(
                dim=c, heads=self.n_heads, dtype=self.dtype, name="rel_pos_bias"
            )(f)
            logits = logits + bias[None].astype(logits.dtype)
        wts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", wts, reshape(v)).reshape(-1, f, inner)
        out = nn.Dense(
            c,
            use_bias=False,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out",
        )(out)
        tokens = tokens + out
        return tokens.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)


def time_token_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Shift half the channels back one frame (imagen_video.py:1037-1044,
    the RWKV-style token shift): x is (B, F, H, W, C); the second channel
    half at frame i sees frame i-1 (zero-padded at the start)."""
    x_keep, x_shift = jnp.split(x, 2, axis=-1)
    x_shift = jnp.pad(x_shift, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
    return jnp.concatenate([x_keep, x_shift], axis=-1)


class ShiftFeedForward(nn.Module):
    """ChanFeedForward with TimeTokenShift (imagen_video.py:1046-1055):
    LN -> 1x1 expand -> GELU -> time token shift -> LN -> 1x1 project,
    residual. Applied on (B, F, H, W, C) video tensors after spatial
    attention, it is the one cross-frame op inside the reference's video
    TransformerBlock."""

    mult: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        hdim = int(c * self.mult)
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        h = nn.Dense(hdim, use_bias=False, dtype=self.dtype, name="expand")(h)
        h = nn.gelu(h)
        h = time_token_shift(h)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(h)
        h = nn.Dense(c, use_bias=False, dtype=self.dtype, name="project")(h)
        return x + h


class TemporalPixelShuffleUpsample(nn.Module):
    """Frame-count upsampling by channel-to-frame shuffle
    (imagen_video.py:645-676): per-pixel 1-D conv to C*stride channels,
    SiLU, then interleave the factor into the frame axis. The conv kernel
    is kaiming-initialized once and replicated across the shuffle factor
    (anti-checkerboard, same trick as the spatial PixelShuffleUpsample)."""

    channels: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        stride = self.stride

        def repeated_kaiming(key, shape, dtype=jnp.float32):
            k, cin, cout_s = shape
            base = nn.initializers.he_uniform()(key, (k, cin, cout_s // stride), dtype)
            return jnp.repeat(base, stride, axis=-1)  # 'o -> (o r)'

        tokens = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        y = nn.Conv(
            self.channels * stride,
            (1,),
            kernel_init=repeated_kaiming,
            dtype=self.dtype,
            name="conv",
        )(tokens)
        y = nn.silu(y)
        # (N, F, (c r)) -> (N, (F r), c): channel-major split, frame-major merge
        y = y.reshape(-1, f, self.channels, stride)
        y = y.transpose(0, 1, 3, 2).reshape(-1, f * stride, self.channels)
        return y.reshape(b, h, w, f * stride, self.channels).transpose(0, 3, 1, 2, 4)


class TemporalDownsample(nn.Module):
    """Frame-count downsampling by frame-to-channel fold + 1x1 conv
    (imagen_video.py:677-683): 'b c (f p) h w -> b (c p) f h w' then conv."""

    channels: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        assert f % self.stride == 0, "frame count must divide temporal stride"
        y = x.reshape(b, f // self.stride, self.stride, h, w, c)
        y = y.transpose(0, 1, 3, 4, 5, 2).reshape(
            b, f // self.stride, h, w, c * self.stride
        )
        flat, bf = fold_frames(y)
        flat = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="conv")(flat)
        return unfold_frames(flat, bf)


class ImagenUNet3D(nn.Module):
    """Video-stage UNet with the ImagenUNet conditioning surface.

    Signature matches ImagenUNet but takes (B, F, H, W, C) videos; the
    cascade calls it through the same black-box convention."""

    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4)
    channels: int = 3
    cond_dim: Optional[int] = None
    text_embed_dim: int = 768
    num_resnet_blocks: int = 1
    layer_attns: Sequence[bool] = (False, True, True)
    layer_cross_attns: Sequence[bool] = (False, True, True)
    temporal_attns: Sequence[bool] = (True, True, True)
    # per-level frame-count stride (imagen_video.py temporal_downsample_factor):
    # level i > 1 downsamples frames by that factor on the way down and
    # pixel-shuffle-upsamples them back on the way up
    temporal_strides: Sequence[int] = ()
    attn_heads: int = 4
    # RWKV-style token shift inside the post-attention feedforward
    # (imagen_video.py ff_time_token_shift, :1046-1055)
    ff_time_token_shift: bool = True
    lowres_cond: bool = False
    self_cond: bool = False
    learned_sinu_dim: int = 16
    max_text_len: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, F, H, W, C)
        noise_cond: jnp.ndarray,  # (B,)
        *,
        text_embeds: Optional[jnp.ndarray] = None,
        text_mask: Optional[jnp.ndarray] = None,
        cond_drop_mask: Optional[jnp.ndarray] = None,
        lowres_cond_img: Optional[jnp.ndarray] = None,  # (B, F, H, W, C)
        lowres_noise_cond: Optional[jnp.ndarray] = None,
        cond_images: Optional[jnp.ndarray] = None,
        self_cond: Optional[jnp.ndarray] = None,
        ignore_time: bool = False,
        train: bool = False,
    ) -> jnp.ndarray:
        """``ignore_time=True`` (static) skips every cross-frame op so each
        frame is processed as an independent image — the reference's
        ignore_time pathway for training a video net on still images
        (imagen_video.py Conv3d/attention ignore_time plumbing). Initialize
        with ignore_time=False so temporal parameters exist."""
        del train, cond_images
        b, f, h_in, w_in, _ = x.shape
        in_dtype = x.dtype
        cond_dim = self.cond_dim or self.dim
        time_cond_dim = self.dim * 4

        parts = [x.astype(self.dtype)]
        if self.lowres_cond:
            lr = (
                jnp.zeros_like(x)
                if lowres_cond_img is None
                else lowres_cond_img.astype(x.dtype)
            )
            if lr.shape[2:4] != (h_in, w_in):
                flat, bf = fold_frames(lr)
                lr = unfold_frames(resize_image(flat, h_in, w_in), bf)
            parts.append(lr.astype(self.dtype))
        if self.self_cond:
            sc = jnp.zeros_like(x) if self_cond is None else self_cond
            parts.append(sc.astype(self.dtype))
        hx = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

        # time conditioning (shared across frames)
        sinu_w = self.param(
            "sinu_freqs",
            nn.initializers.normal(1.0),
            (self.learned_sinu_dim // 2,),
            jnp.float32,
        )
        t_feat = learned_sinusoidal_embedding(noise_cond, sinu_w).astype(self.dtype)
        t_hid = nn.silu(nn.Dense(time_cond_dim, dtype=self.dtype, name="time_mlp1")(t_feat))
        time_cond = nn.Dense(time_cond_dim, dtype=self.dtype, name="time_mlp2")(t_hid)
        if self.lowres_cond:
            lr_noise = (
                jnp.zeros((b,), jnp.float32)
                if lowres_noise_cond is None
                else lowres_noise_cond
            )
            lr_w = self.param(
                "lowres_sinu_freqs",
                nn.initializers.normal(1.0),
                (self.learned_sinu_dim // 2,),
                jnp.float32,
            )
            lr_feat = learned_sinusoidal_embedding(lr_noise, lr_w).astype(self.dtype)
            lr_hid = nn.silu(
                nn.Dense(time_cond_dim, dtype=self.dtype, name="lr_mlp1")(lr_feat)
            )
            time_cond = time_cond + nn.Dense(
                time_cond_dim, dtype=self.dtype, name="lr_mlp2"
            )(lr_hid)

        context = None
        context_mask = None
        if text_embeds is not None:
            text_tokens = nn.Dense(cond_dim, dtype=self.dtype, name="text_to_cond")(
                text_embeds.astype(self.dtype)
            )
            null_text = self.param(
                "null_text_embed",
                nn.initializers.normal(0.02),
                (self.max_text_len, cond_dim),
                jnp.float32,
            )
            if cond_drop_mask is not None:
                keep = (~cond_drop_mask).astype(self.dtype).reshape(b, 1, 1)
                ln = text_tokens.shape[1]
                text_tokens = text_tokens * keep + null_text[None, :ln].astype(
                    self.dtype
                ) * (1 - keep)
            pooled = _attention_pool(text_tokens, text_mask)
            time_cond = time_cond + nn.Dense(
                time_cond_dim, dtype=self.dtype, name="text_to_hidden"
            )(pooled)
            context = nn.LayerNorm(dtype=self.dtype, name="context_ln")(text_tokens)
            context_mask = text_mask

        # frame-folded conditioning tensors, recomputed per level because
        # temporal strides change the frame count down the pyramid
        def folded_cond(f_now: int):
            tc = jnp.repeat(time_cond, f_now, axis=0)
            cf = (
                jnp.repeat(context, f_now, axis=0) if context is not None else None
            )
            cm = (
                jnp.repeat(context_mask, f_now, axis=0)
                if context_mask is not None
                else None
            )
            return tc, cf, cm

        dims = [self.dim * m for m in self.dim_mults]
        n_levels = len(dims)
        t_strides = (
            list(self.temporal_strides)
            if self.temporal_strides
            else [1] * n_levels
        )
        assert len(t_strides) == n_levels

        flat, bf = fold_frames(hx)
        flat = nn.Conv(dims[0], (7, 7), padding=3, dtype=self.dtype, name="init_conv")(
            flat
        )
        hx = unfold_frames(flat, bf)
        if not ignore_time:
            hx = TemporalConv(dims[0], dtype=self.dtype, name="init_temporal")(hx)

        skips = []
        for lvl in range(n_levels):
            use_cross = self.layer_cross_attns[lvl]
            tc_f, ctx_f, cm_f = folded_cond(hx.shape[1])
            flat, bf = fold_frames(hx)
            for bi in range(self.num_resnet_blocks):
                flat = ResnetBlock(
                    dims[lvl],
                    cond_dim=cond_dim if use_cross else None,
                    time_cond_dim=time_cond_dim,
                    dtype=self.dtype,
                    name=f"down_{lvl}_res{bi}",
                )(
                    flat,
                    tc_f,
                    ctx_f if use_cross else None,
                    cm_f if use_cross else None,
                )
            if self.layer_attns[lvl]:
                flat = TransformerBlock(
                    n_heads=self.attn_heads, dtype=self.dtype, name=f"down_{lvl}_attn"
                )(flat)
            hx = unfold_frames(flat, bf)
            if self.layer_attns[lvl] and self.ff_time_token_shift and not ignore_time:
                hx = ShiftFeedForward(dtype=self.dtype, name=f"down_{lvl}_shift_ff")(hx)
            if not ignore_time:
                hx = TemporalConv(
                    dims[lvl], dtype=self.dtype, name=f"down_{lvl}_tconv"
                )(hx)
                if self.temporal_attns[lvl]:
                    hx = TemporalAttention(
                        n_heads=self.attn_heads,
                        dtype=self.dtype,
                        name=f"down_{lvl}_tattn",
                    )(hx)
            skips.append(hx)
            if lvl < n_levels - 1:
                flat, bf = fold_frames(hx)
                flat = nn.Conv(
                    dims[lvl + 1],
                    (4, 4),
                    strides=2,
                    padding=1,
                    dtype=self.dtype,
                    name=f"down_{lvl}_downsample",
                )(flat)
                hx = unfold_frames(flat, bf)
                # frame-count resampling is also a cross-frame op: skipped
                # under ignore_time (and symmetric with the up path, so
                # shapes stay consistent)
                if t_strides[lvl + 1] > 1 and not ignore_time:
                    hx = TemporalDownsample(
                        dims[lvl + 1],
                        stride=t_strides[lvl + 1],
                        dtype=self.dtype,
                        name=f"down_{lvl}_tdown",
                    )(hx)

        tc_f, ctx_f, cm_f = folded_cond(hx.shape[1])
        flat, bf = fold_frames(hx)
        flat = ResnetBlock(
            dims[-1],
            cond_dim=cond_dim,
            time_cond_dim=time_cond_dim,
            dtype=self.dtype,
            name="mid_res1",
        )(flat, tc_f, ctx_f, cm_f)
        flat = ResnetBlock(
            dims[-1],
            cond_dim=cond_dim,
            time_cond_dim=time_cond_dim,
            dtype=self.dtype,
            name="mid_res2",
        )(flat, tc_f, ctx_f, cm_f)
        hx = unfold_frames(flat, bf)
        if not ignore_time:
            hx = TemporalAttention(
                n_heads=self.attn_heads, dtype=self.dtype, name="mid_tattn"
            )(hx)

        for lvl in reversed(range(n_levels)):
            use_cross = self.layer_cross_attns[lvl]
            if lvl < n_levels - 1:
                if t_strides[lvl + 1] > 1 and not ignore_time:
                    hx = TemporalPixelShuffleUpsample(
                        dims[lvl + 1],
                        stride=t_strides[lvl + 1],
                        dtype=self.dtype,
                        name=f"up_{lvl}_tup",
                    )(hx)
                flat, bf = fold_frames(hx)
                b_, hh, ww, _ = flat.shape
                flat = resize_image(flat, hh * 2, ww * 2, method="nearest")
                flat = nn.Conv(
                    dims[lvl], (3, 3), padding=1, dtype=self.dtype,
                    name=f"up_{lvl}_upsample",
                )(flat)
                hx = unfold_frames(flat, bf)
            hx = jnp.concatenate([hx, skips[lvl]], axis=-1)
            tc_f, ctx_f, cm_f = folded_cond(hx.shape[1])
            flat, bf = fold_frames(hx)
            for bi in range(self.num_resnet_blocks):
                flat = ResnetBlock(
                    dims[lvl],
                    cond_dim=cond_dim if use_cross else None,
                    time_cond_dim=time_cond_dim,
                    dtype=self.dtype,
                    name=f"up_{lvl}_res{bi}",
                )(
                    flat,
                    tc_f,
                    ctx_f if use_cross else None,
                    cm_f if use_cross else None,
                )
            hx = unfold_frames(flat, bf)
            if not ignore_time:
                hx = TemporalConv(
                    dims[lvl], dtype=self.dtype, name=f"up_{lvl}_tconv"
                )(hx)
                if self.temporal_attns[lvl]:
                    hx = TemporalAttention(
                        n_heads=self.attn_heads,
                        dtype=self.dtype,
                        name=f"up_{lvl}_tattn",
                    )(hx)

        flat, bf = fold_frames(hx)
        out = nn.Conv(
            self.channels, (3, 3), padding=1, dtype=jnp.float32, name="final_conv"
        )(flat.astype(jnp.float32))
        return unfold_frames(out, bf).astype(in_dtype)


__all__ = [
    "ImagenUNet3D",
    "TemporalConv",
    "TemporalAttention",
    "TemporalDownsample",
    "TemporalPixelShuffleUpsample",
    "DynamicPositionBias",
    "ShiftFeedForward",
    "time_token_shift",
    "resize_video_to",
    "scale_video_time",
    "fold_frames",
    "unfold_frames",
]
