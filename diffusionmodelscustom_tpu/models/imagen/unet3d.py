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
from .blocks import LinearAttention, PerceiverResampler
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


class TemporalPEG(nn.Module):
    """Temporal position-encoding generator (imagen_video.py:1412-1413):
    ``Residual(Pad + Conv3d(dim, dim, (3, 1, 1), groups=dim))`` — a
    depthwise conv over the frame axis, applied immediately before each
    temporal attention so the attention sees convolutional positional
    information. Causal nets pad (2, 0) over frames (the reference's
    ``time_causal_attn`` padding), acausal (1, 1)."""

    channels: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        tokens = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        pad = (2, 0) if self.causal else (1, 1)
        out = nn.Conv(
            self.channels,
            (3,),
            padding=(pad,),
            feature_group_count=self.channels,
            dtype=self.dtype,
            name="conv",
        )(tokens)
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
    temporal_attn lambda always enables it, imagen_video.py:1415), and
    ``causal`` masks future frames (time_causal_attn)."""

    n_heads: int = 4
    rel_pos_bias: bool = True
    rel_pos_bias_depth: int = 2
    causal: bool = False
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
                dim=c,
                heads=self.n_heads,
                depth=self.rel_pos_bias_depth,
                dtype=self.dtype,
                name="rel_pos_bias",
            )(f)
            logits = logits + bias[None].astype(logits.dtype)
        if self.causal:
            i = jnp.arange(f)
            causal_mask = i[:, None] >= i[None, :]  # query attends past/self
            logits = jnp.where(
                causal_mask[None, None], logits, jnp.float32(-1e9)
            )
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
    """Video-stage UNet with the full ImagenUNet knob surface
    (imagen_video.py Unet3D, :1222-1330 kwargs).

    Signature matches ImagenUNet but takes (B, F, H, W, C) videos; the
    cascade calls it through the same black-box convention. Spatial
    processing reuses the 2-D blocks on frame-folded batches; temporal
    convs/attention (with DynamicPositionBias) interleave per level."""

    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4)
    channels: int = 3
    channels_out: Optional[int] = None
    cond_dim: Optional[int] = None
    text_embed_dim: int = 768
    cond_on_text: bool = True
    num_resnet_blocks: int | Sequence[int] = 1
    layer_attns: bool | Sequence[bool] = (False, True, True)
    layer_attns_depth: int | Sequence[int] = 1
    layer_attns_add_text_cond: bool = True
    attend_at_middle: bool = True
    layer_mid_attns_depth: int = 1
    layer_cross_attns: bool | Sequence[bool] = (False, True, True)
    use_linear_attn: bool | Sequence[bool] = False
    use_linear_cross_attn: bool | Sequence[bool] = False
    temporal_attns: bool | Sequence[bool] = (True, True, True)
    # per-level frame-count stride (imagen_video.py temporal_strides):
    # level i > 1 downsamples frames by that factor on the way down and
    # pixel-shuffle-upsamples them back on the way up
    temporal_strides: Sequence[int] = ()
    attn_heads: int = 4
    attn_dim_head: Optional[int] = None  # None -> c // n_heads (min 16)
    ff_mult: int = 2
    # RWKV-style token shift inside the post-attention feedforward
    # (imagen_video.py ff_time_token_shift, :1046-1055)
    ff_time_token_shift: bool = True
    # causal masking + bias MLP depth for temporal attention
    # (imagen_video.py time_causal_attn / time_rel_pos_bias_depth, :1415)
    time_causal_attn: bool = False
    time_rel_pos_bias_depth: int = 2
    lowres_cond: bool = False
    cond_images_channels: int = 0
    self_cond: bool = False
    learned_sinu_dim: int = 16
    num_time_tokens: int = 2
    max_text_len: int = 256
    # text pooling: 'perceiver' (the reference video net's default,
    # imagen_video.py attn_pool_text=True) or 'attention_pool'
    text_pool: str = "perceiver"
    num_latents: int = 32  # imagen_video.py attn_pool_num_latents
    resnet_groups: int = 8
    init_dim: Optional[int] = None
    init_conv_kernel_size: int = 7
    final_conv_kernel_size: int = 3
    final_resnet_block: bool = True
    init_conv_to_final_conv_residual: bool = False
    scale_skip_connection: bool = True  # reference default (imagen_video.py)
    use_global_context: bool = False
    memory_efficient: bool = False
    resize_mode: str = "nearest"
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
        del train
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
                lr = resize_video_to(lr, h_in, w_in, method=self.resize_mode)
            parts.append(lr.astype(self.dtype))
        if self.self_cond:
            sc = jnp.zeros_like(x) if self_cond is None else self_cond
            parts.append(sc.astype(self.dtype))
        if self.cond_images_channels:
            ci = (
                jnp.zeros(
                    (b, f, h_in, w_in, self.cond_images_channels), self.dtype
                )
                if cond_images is None
                else cond_images.astype(self.dtype)
            )
            if ci.shape[2:4] != (h_in, w_in):
                ci = resize_video_to(ci, h_in, w_in, method=self.resize_mode)
            parts.append(ci)
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
        # time tokens join the cross-attention context like the 2-D net
        # (imagen_pytorch.py:2475; the video net shares that design)
        time_tokens = nn.Dense(
            cond_dim * self.num_time_tokens, dtype=self.dtype,
            name="to_time_tokens",
        )(t_hid).reshape(b, self.num_time_tokens, cond_dim)
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

        if not self.cond_on_text:
            text_embeds = text_mask = None
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
            if self.text_pool == "perceiver":
                # PerceiverResampler pooling (imagen_video.py
                # attn_pool_text=True default): the resampled latents
                # replace the raw tokens as cross-attention context
                resampled = PerceiverResampler(
                    depth=2,
                    num_latents=self.num_latents,
                    dtype=self.dtype,
                    name="perceiver",
                )(text_tokens, text_mask)
                pooled = resampled.mean(axis=1)
                text_tokens = resampled
                text_mask = None
            else:
                pooled = _attention_pool(text_tokens, text_mask)
            time_cond = time_cond + nn.Dense(
                time_cond_dim, dtype=self.dtype, name="text_to_hidden"
            )(pooled)
            context = nn.LayerNorm(dtype=self.dtype, name="context_ln")(
                jnp.concatenate([time_tokens, text_tokens], axis=1)
            )
            if text_mask is not None:
                context_mask = jnp.concatenate(
                    [
                        jnp.ones((b, self.num_time_tokens), bool),
                        text_mask.astype(bool),
                    ],
                    axis=1,
                )
                if cond_drop_mask is not None:
                    context_mask = jnp.where(
                        cond_drop_mask[:, None], True, context_mask
                    )
        else:
            context = nn.LayerNorm(dtype=self.dtype, name="context_ln")(time_tokens)

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

        def per_level(flag):
            return (
                [flag] * n_levels
                if isinstance(flag, (bool, int))
                else list(flag)
            )

        layer_attns = per_level(self.layer_attns)
        layer_cross_attns = per_level(self.layer_cross_attns)
        attn_depths = per_level(self.layer_attns_depth)
        temporal_attns = per_level(self.temporal_attns)
        linear_attns = per_level(self.use_linear_attn)
        linear_cross = per_level(self.use_linear_cross_attn)
        n_blocks = per_level(self.num_resnet_blocks)
        skip_scale = 2**-0.5 if self.scale_skip_connection else 1.0
        ts = self.temporal_strides
        if isinstance(ts, int):  # reference default is scalar 1
            t_strides = [ts] * n_levels
        else:
            t_strides = list(ts) if ts else [1] * n_levels
        assert len(t_strides) == n_levels

        ResBlock = nn.remat(ResnetBlock) if self.memory_efficient else ResnetBlock

        def spatial_attn(flat, lvl_name, depth, ctx):
            return TransformerBlock(
                n_heads=self.attn_heads,
                head_dim=self.attn_dim_head,
                ff_mult=self.ff_mult,
                depth=depth,
                dtype=self.dtype,
                name=lvl_name,
            )(flat, ctx if self.layer_attns_add_text_cond else None)

        def temporal_attn(hx, name):
            # PEG immediately before every temporal attention
            # (imagen_video.py:1744, 1865, 1882, 1905)
            hx = TemporalPEG(
                hx.shape[-1],
                causal=self.time_causal_attn,
                dtype=self.dtype,
                name=f"{name}_peg",
            )(hx)
            return TemporalAttention(
                n_heads=self.attn_heads,
                causal=self.time_causal_attn,
                rel_pos_bias_depth=self.time_rel_pos_bias_depth,
                dtype=self.dtype,
                name=name,
            )(hx)

        flat, bf = fold_frames(hx)
        ks = self.init_conv_kernel_size
        flat = nn.Conv(
            self.init_dim or dims[0], (ks, ks), padding=ks // 2,
            dtype=self.dtype, name="init_conv",
        )(flat)
        hx = unfold_frames(flat, bf)
        init_feats = hx if self.init_conv_to_final_conv_residual else None
        if not ignore_time:
            # init_conv -> init_temporal_peg -> temporal mixing
            # (imagen_video.py:1742-1744)
            hx = TemporalPEG(
                self.init_dim or dims[0],
                causal=self.time_causal_attn,
                dtype=self.dtype,
                name="init_tpeg",
            )(hx)
            hx = TemporalConv(
                self.init_dim or dims[0], dtype=self.dtype, name="init_temporal"
            )(hx)

        skips = []
        for lvl in range(n_levels):
            use_cross = layer_cross_attns[lvl]
            use_lin_cross = not use_cross and linear_cross[lvl]
            tc_f, ctx_f, cm_f = folded_cond(hx.shape[1])
            flat, bf = fold_frames(hx)
            for bi in range(n_blocks[lvl]):
                flat = ResBlock(
                    dims[lvl],
                    cond_dim=cond_dim if (use_cross or use_lin_cross) else None,
                    time_cond_dim=time_cond_dim,
                    groups=self.resnet_groups,
                    use_global_context=self.use_global_context,
                    linear_cross_attn=use_lin_cross,
                    dtype=self.dtype,
                    name=f"down_{lvl}_res{bi}",
                )(
                    flat,
                    tc_f,
                    ctx_f if (use_cross or use_lin_cross) else None,
                    cm_f if (use_cross or use_lin_cross) else None,
                )
            if layer_attns[lvl]:
                flat = spatial_attn(
                    flat, f"down_{lvl}_attn", attn_depths[lvl], ctx_f
                )
            elif linear_attns[lvl]:
                flat = flat + LinearAttention(
                    dtype=self.dtype, name=f"down_{lvl}_linattn"
                )(flat)
            hx = unfold_frames(flat, bf)
            if layer_attns[lvl] and self.ff_time_token_shift and not ignore_time:
                hx = ShiftFeedForward(
                    mult=self.ff_mult, dtype=self.dtype,
                    name=f"down_{lvl}_shift_ff",
                )(hx)
            if not ignore_time:
                hx = TemporalConv(
                    dims[lvl], dtype=self.dtype, name=f"down_{lvl}_tconv"
                )(hx)
                if temporal_attns[lvl]:
                    hx = temporal_attn(hx, f"down_{lvl}_tattn")
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
        flat = ResBlock(
            dims[-1],
            cond_dim=cond_dim,
            time_cond_dim=time_cond_dim,
            groups=self.resnet_groups,
            dtype=self.dtype,
            name="mid_res1",
        )(flat, tc_f, ctx_f, cm_f)
        if self.attend_at_middle:
            flat = spatial_attn(
                flat, "mid_attn", self.layer_mid_attns_depth, ctx_f
            )
        flat = ResBlock(
            dims[-1],
            cond_dim=cond_dim,
            time_cond_dim=time_cond_dim,
            groups=self.resnet_groups,
            dtype=self.dtype,
            name="mid_res2",
        )(flat, tc_f, ctx_f, cm_f)
        hx = unfold_frames(flat, bf)
        if not ignore_time:
            hx = temporal_attn(hx, "mid_tattn")

        for lvl in reversed(range(n_levels)):
            use_cross = layer_cross_attns[lvl]
            use_lin_cross = not use_cross and linear_cross[lvl]
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
                flat = resize_image(flat, hh * 2, ww * 2, method=self.resize_mode)
                flat = nn.Conv(
                    dims[lvl], (3, 3), padding=1, dtype=self.dtype,
                    name=f"up_{lvl}_upsample",
                )(flat)
                hx = unfold_frames(flat, bf)
            hx = jnp.concatenate([hx, skips[lvl] * skip_scale], axis=-1)
            tc_f, ctx_f, cm_f = folded_cond(hx.shape[1])
            flat, bf = fold_frames(hx)
            for bi in range(n_blocks[lvl]):
                flat = ResBlock(
                    dims[lvl],
                    cond_dim=cond_dim if (use_cross or use_lin_cross) else None,
                    time_cond_dim=time_cond_dim,
                    groups=self.resnet_groups,
                    use_global_context=self.use_global_context,
                    linear_cross_attn=use_lin_cross,
                    dtype=self.dtype,
                    name=f"up_{lvl}_res{bi}",
                )(
                    flat,
                    tc_f,
                    ctx_f if (use_cross or use_lin_cross) else None,
                    cm_f if (use_cross or use_lin_cross) else None,
                )
            if layer_attns[lvl]:
                flat = spatial_attn(
                    flat, f"up_{lvl}_attn", attn_depths[lvl], ctx_f
                )
            elif linear_attns[lvl]:
                flat = flat + LinearAttention(
                    dtype=self.dtype, name=f"up_{lvl}_linattn"
                )(flat)
            hx = unfold_frames(flat, bf)
            if layer_attns[lvl] and self.ff_time_token_shift and not ignore_time:
                hx = ShiftFeedForward(
                    mult=self.ff_mult, dtype=self.dtype,
                    name=f"up_{lvl}_shift_ff",
                )(hx)
            if not ignore_time:
                hx = TemporalConv(
                    dims[lvl], dtype=self.dtype, name=f"up_{lvl}_tconv"
                )(hx)
                if temporal_attns[lvl]:
                    hx = temporal_attn(hx, f"up_{lvl}_tattn")

        if init_feats is not None:
            hx = jnp.concatenate([hx, init_feats], axis=-1)
        if self.final_resnet_block:
            tc_f, _, _ = folded_cond(hx.shape[1])
            flat, bf = fold_frames(hx)
            flat = ResnetBlock(
                dims[0],
                time_cond_dim=time_cond_dim,
                groups=self.resnet_groups,
                dtype=self.dtype,
                name="final_res_block",
            )(flat, tc_f)
            hx = unfold_frames(flat, bf)
        flat, bf = fold_frames(hx)
        fk = self.final_conv_kernel_size
        out = nn.Conv(
            self.channels_out or self.channels,
            (fk, fk),
            padding=fk // 2,
            dtype=jnp.float32,
            name="final_conv",
        )(flat.astype(jnp.float32))
        return unfold_frames(out, bf).astype(in_dtype)


# Reference Unet3D.__init__ kwarg -> ImagenUNet3D field
# (imagen_video.py:1222-1330). Names identical to the 2-D map where shared;
# `num_image_tokens` and `dropout` are dead in the reference video net too.
_REF_3D_KNOB_MAP = {
    "learned_sinu_pos_emb_dim": "learned_sinu_dim",
    "out_dim": "channels_out",
    "use_global_context_attn": "use_global_context",
    "num_image_tokens": None,
    "dropout": None,
    "attn_pool_num_latents": "num_latents",
    # knobs whose video-net realization differs structurally here and is
    # intentionally not exposed (documented divergence): cross-embed stems
    # and pixel-shuffle spatial upsampling use the plain conv stems
    "init_cross_embed": None,
    "init_cross_embed_kernel_sizes": None,
    "cross_embed_downsample": None,
    "cross_embed_downsample_kernel_sizes": None,
    "combine_upsample_fmaps": None,
    "pixel_shuffle_upsample": None,
}


def unet3d_from_ref_config(knobs: dict, **overrides) -> ImagenUNet3D:
    """Build an :class:`ImagenUNet3D` from reference-named kwargs
    (imagen_video.py:1222-1330); ``overrides`` win over ``knobs``."""
    field_names = set(ImagenUNet3D.__dataclass_fields__)
    kw: dict = {}
    for key, val in knobs.items():
        if key == "attn_pool_text":
            kw["text_pool"] = "perceiver" if val else "attention_pool"
            continue
        target = _REF_3D_KNOB_MAP.get(
            key, key if key in field_names else False
        )
        if target is False:
            raise TypeError(f"unknown Unet3D knob {key!r}")
        if target is not None:
            kw[target] = tuple(val) if isinstance(val, list) else val
    kw.update(overrides)
    return ImagenUNet3D(**kw)


__all__ = [
    "ImagenUNet3D",
    "unet3d_from_ref_config",
    "TemporalConv",
    "TemporalPEG",
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
