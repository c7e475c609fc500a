"""Flagship TPU-first conditional UNet (the framework's performance path).

Architecture follows the reference's "clean" UNet
(DDPM_clean_application/src/unet_ms.py:5-179 — DoubleConv with
GroupNorm+GELU, MaxPool downs, bilinear-upsample ups with SiLU-Linear time
embeddings, self-attention with a transformer FFN), widened to the full
DANRA conditioning surface of the research model
(modules_DANRA_conditional.py:228-256): low-res conditioning image
(interpolated to target resolution and channel-concatenated,
src/unet_ms.py:148-161), land-sea mask and topography channels, and an
additive season-label embedding on the time embedding.

TPU-first choices:

* NHWC + bfloat16 compute (params stay f32): convs tile straight onto the
  MXU; ``dtype=jnp.bfloat16`` halves HBM traffic.
* Attention only at the configured inner scales (sequence <= 1024 tokens
  at the default config) through the fused flash-attention op.
* Everything is shape-static: conditioning is always present as channels
  (zeros when absent) so a single compiled graph serves conditional,
  unconditional, and CFG branches.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import ImageSelfAttention
from ..ops.embeddings import pos_encoding_block
from ..ops.im2col_conv import Im2ColConv3x3
from ..ops.quantized_conv import DynamicInt8Conv3x3
from ..ops.resize import resize_image, upsample_2x


class _ConvKernel(nn.Module):
    """Parameter-only stand-in for ``nn.Conv(..., use_bias=False)``:
    declares the identical ("kernel", (3,3,Cin,Cout) f32) leaf so the
    fused Pallas path (ops/fused_conv_gn.py) shares checkpoints with the
    unfused model byte-for-byte."""

    features: int

    @nn.compact
    def __call__(self, cin: int) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32,
        )


class _GNParams(nn.Module):
    """Parameter-only stand-in for ``nn.GroupNorm`` (scale/bias leaves)."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32),
        )


class DoubleConv(nn.Module):
    """3x3 conv -> GroupNorm -> GELU -> 3x3 conv -> GroupNorm, optional
    residual with trailing GELU (src/unet_ms.py:30-49)."""

    out_channels: int
    mid_channels: Optional[int] = None
    residual: bool = False
    num_groups: int = 1  # reference uses GroupNorm(1, ...) == LayerNorm-ish
    dtype: jnp.dtype = jnp.float32
    # serving-only dynamic int8 convs (ops/quantized_conv.py) for the
    # >=128-feature convs where the int8 MXU path wins 1.47x; parameter
    # tree is unchanged, so trained checkpoints load either way
    quantized: bool = False
    # Pallas im2col kernel for the narrow (<128ch) convs where XLA's
    # direct conv half-fills the MXU lanes (ops/im2col_conv.py; exact,
    # differentiable, same parameter tree). Measured in-context before
    # defaulting — see the probe notes in scripts/probe_im2col_r2.py.
    im2col_narrow: bool = False
    # fused width-packed conv+GN(1)+GELU Pallas kernel for the narrow
    # halves (ops/fused_conv_gn.py): pack/unpack stays INSIDE the kernel
    # (bitcast at the HBM boundary) so XLA layout assignment never sees
    # it, and the norm+activation epilogue runs on the VMEM-resident
    # accumulator. Same parameter tree (see _ConvKernel/_GNParams).
    # Probe: scripts/probe_fused_conv_r4.py.
    fused_narrow: bool = False

    def _norm(self, channels: int, name: str):
        # Measured (v5e, round 2): swapping in the fused Pallas GroupNorm1
        # (ops/group_norm.py) REGRESSED the 128px train step 13.1 -> 9.9
        # steps/s — XLA fuses the norm into the neighboring convs' prologue
        # /epilogue, which beats the isolated-kernel win; the opaque
        # pallas_call blocks that fusion. Keep XLA's GroupNorm here; the
        # fused op remains available for standalone-norm workloads.
        return nn.GroupNorm(
            num_groups=min(self.num_groups, channels), dtype=self.dtype, name=name
        )

    def _conv(self, features: int, name: str):
        # Measured (v5e, round 3): swapping the narrow-channel convs for
        # the width-pair packed formulation (ops/packed_conv.py) wins 1.6x
        # in ISOLATION (1.20 -> 0.76 ms at 32x128x128x64) but REGRESSED
        # the full model (fwd 20.0 -> 27.3 ms, train step 67.8 -> 79.1) —
        # in context, XLA's layout assignment turns the pack/unpack
        # reshapes into relayout copies around every conv. Same lesson as
        # the fused GroupNorm kernel (see _norm): keep nn.Conv here; the
        # packed op stays in the library for standalone narrow-channel
        # workloads.
        if self.quantized and features >= 128:
            return DynamicInt8Conv3x3(features, dtype=self.dtype, name=name)
        return nn.Conv(
            features, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name=name,
        )

    def _conv_for(self, in_ch: int, features: int, name: str):
        # narrow convs (either side < 128 lanes) through the im2col kernel
        if self.im2col_narrow and not self.quantized and (
            in_ch < 128 or features < 128
        ):
            return Im2ColConv3x3(features, dtype=self.dtype, name=name)
        return self._conv(features, name)

    def _fuse_ok(self, cin: int, cout: int, x: jnp.ndarray) -> bool:
        # fused path: GN(1) halves on narrow maps with an even width
        # (the kernel packs width pairs into the channel axis)
        return (
            self.fused_narrow
            and not self.quantized
            and not self.im2col_narrow
            and self.num_groups == 1
            and max(cin, cout) <= 64
            and x.shape[2] % 2 == 0
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.fused_conv_gn import fused_conv_gn_gelu

        mid = self.mid_channels or self.out_channels
        if self._fuse_ok(x.shape[-1], mid, x):
            kernel = _ConvKernel(mid, name="conv1")(x.shape[-1])
            gamma, beta = _GNParams(mid, name="gn1")()
            h = fused_conv_gn_gelu(
                x.astype(self.dtype), kernel.astype(self.dtype), gamma, beta,
            )
        else:
            h = self._conv_for(x.shape[-1], mid, "conv1")(x)
            h = self._norm(mid, "gn1")(h)
            h = nn.gelu(h)
        if self._fuse_ok(mid, self.out_channels, h):
            kernel = _ConvKernel(self.out_channels, name="conv2")(mid)
            gamma, beta = _GNParams(self.out_channels, name="gn2")()
            # residual mode = gelu(x + gn2(conv2(h))); plain mode has no
            # trailing activation
            return fused_conv_gn_gelu(
                h.astype(self.dtype), kernel.astype(self.dtype), gamma, beta,
                residual=x if self.residual else None,
                gelu=self.residual,
            ).astype(x.dtype)
        h = self._conv_for(mid, self.out_channels, "conv2")(h)
        h = self._norm(self.out_channels, "gn2")(h)
        if self.residual:
            return nn.gelu(x + h)
        return h


class Down(nn.Module):
    """MaxPool 2x -> residual DoubleConv -> DoubleConv, then additive
    SiLU-Linear time embedding (src/unet_ms.py:52-73)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    im2col_narrow: bool = False
    fused_narrow: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = DoubleConv(in_ch, residual=True, dtype=self.dtype,
                       quantized=self.quantized,
                       im2col_narrow=self.im2col_narrow,
                       fused_narrow=self.fused_narrow, name="res")(x)
        x = DoubleConv(self.out_channels, dtype=self.dtype,
                       quantized=self.quantized,
                       im2col_narrow=self.im2col_narrow,
                       fused_narrow=self.fused_narrow, name="proj")(x)
        emb = nn.silu(t_emb)
        emb = nn.Dense(self.out_channels, dtype=self.dtype, name="emb")(emb)
        return x + emb[:, None, None, :]


class Up(nn.Module):
    """Bilinear 2x upsample -> skip concat -> residual DoubleConv ->
    DoubleConv, then additive time embedding (src/unet_ms.py:76-100)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    im2col_narrow: bool = False
    fused_narrow: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip: jnp.ndarray, t_emb: jnp.ndarray
    ) -> jnp.ndarray:
        x = upsample_2x(x, method="bilinear")
        x = jnp.concatenate([skip, x], axis=-1)
        in_ch = x.shape[-1]
        x = DoubleConv(in_ch, residual=True, dtype=self.dtype,
                       quantized=self.quantized,
                       im2col_narrow=self.im2col_narrow,
                       fused_narrow=self.fused_narrow, name="res")(x)
        x = DoubleConv(
            self.out_channels, mid_channels=in_ch // 2, dtype=self.dtype,
            quantized=self.quantized, im2col_narrow=self.im2col_narrow,
            fused_narrow=self.fused_narrow, name="proj"
        )(x)
        emb = nn.silu(t_emb)
        emb = nn.Dense(self.out_channels, dtype=self.dtype, name="emb")(emb)
        return x + emb[:, None, None, :]


class ConditionalUNet(nn.Module):
    """The flagship noise-prediction UNet.

    Signature mirrors the reference black-box callable
    model(x, t, y, cond_img, lsm_cond, topo_cond) -> eps_hat
    (modules_DANRA_conditional.py:597-616), NHWC. Conditioning channels
    that the config enables are always expected (pass zeros to drop them);
    ``y`` uses label ``num_classes`` as the CFG null class.

    Default widths (64,128,256) with a 256-channel bottleneck match the
    reference UNet_downscale (src/unet_ms.py:119-136).
    """

    out_channels: int = 1
    base_channels: int = 64
    channel_mults: Sequence[int] = (1, 2, 4)
    bottleneck_mult: int = 4
    time_dim: int = 256
    n_heads: int = 4
    # TPU-first: cap heads so head_dim >= attn_head_dim. The MXU contracts
    # over 128 lanes; head_dim 32 (4 heads at C=128) pads 4x in the flash
    # kernel (measured 14 TF/s vs the ~150 TF/s matmul ceiling). With
    # head_dim 128 the contraction is full-width. Parameter shapes are
    # unchanged (the qkv projection is 3C regardless of head count).
    # Set to None to honor n_heads exactly (reference-parity behavior).
    attn_head_dim: Optional[int] = 128
    num_classes: Optional[int] = None
    cond_img_channels: int = 0  # low-res conditioning image channels
    cond_on_lsm: bool = False
    cond_on_topo: bool = False
    attention_levels: Sequence[int] = (1, 2, 3)  # after down i (1-indexed)
    # Decoder attention by resolution level (0 = full res). The reference
    # attends at /4, /2 and full resolution on the way up
    # (src/unet_ms.py:131-135: sa4, sa5, sa6).
    attention_levels_up: Sequence[int] = (2, 1, 0)
    interp_mode: str = "bicubic"  # LR-cond upsample (src/unet_ms.py:156)
    dtype: jnp.dtype = jnp.float32
    # Serving-only: dynamic int8 compute for the wide (>=128ch) convs
    # (1.47x on the v5e int8 MXU path, ops/quantized_conv.py) AND for the
    # attention QK logit matmuls (ops/flash_attention.py int8 kernel).
    # Approximate; keep False for training and exact-parity sampling.
    conv_quant: bool = False
    # Serving-only, on top of conv_quant: also quantize the attention PV
    # matmul (ops/flash_attention.py int8 QK+PV kernel) so both attention
    # contractions run at the MXU's 2x int8 rate.
    attn_pv_int8: bool = False
    # Route the narrow (<128ch) convs through the exact Pallas im2col
    # kernel (ops/im2col_conv.py) — packs the 3x3 taps into the MXU
    # contraction where XLA's direct conv half-fills the lanes. Exact and
    # differentiable; parameter tree unchanged.
    im2col_narrow: bool = False
    # Route the narrow (<=64ch) DoubleConv halves through the fused
    # width-packed conv+GN(1)+GELU Pallas kernel (ops/fused_conv_gn.py).
    # Exact, differentiable, parameter tree unchanged; measured in
    # scripts/probe_fused_conv_r4.py before any default flip.
    fused_narrow: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        cond_img: Optional[jnp.ndarray] = None,
        lsm_cond: Optional[jnp.ndarray] = None,
        topo_cond: Optional[jnp.ndarray] = None,
        train: bool = False,  # API parity; this net has no train-time state
    ) -> jnp.ndarray:
        del train
        b, h_in, w_in, _ = x.shape
        in_dtype = x.dtype

        # --- conditioning channels (always-static channel arity) ---------
        parts = [x.astype(self.dtype)]
        if self.cond_on_lsm:
            lsm = (
                jnp.zeros((b, h_in, w_in, 1), self.dtype)
                if lsm_cond is None
                else lsm_cond.astype(self.dtype)
            )
            parts.append(lsm)
        if self.cond_on_topo:
            topo = (
                jnp.zeros((b, h_in, w_in, 1), self.dtype)
                if topo_cond is None
                else topo_cond.astype(self.dtype)
            )
            parts.append(topo)
        if self.cond_img_channels:
            if cond_img is None:
                ci = jnp.zeros((b, h_in, w_in, self.cond_img_channels), self.dtype)
            else:
                ci = cond_img.astype(self.dtype)
                if ci.shape[1:3] != (h_in, w_in):
                    ci = resize_image(ci, h_in, w_in, method=self.interp_mode)
            parts.append(ci)
        h = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

        # --- time + label embedding --------------------------------------
        t_emb = pos_encoding_block(t, self.time_dim, n=10000.0).astype(self.dtype)
        if self.num_classes is not None:
            if y is None:
                y = jnp.full((b,), self.num_classes, jnp.int32)  # null class
            label = nn.Embed(
                self.num_classes + 1, self.time_dim, dtype=self.dtype, name="label_emb"
            )(y)
            t_emb = t_emb + label

        # --- encoder -----------------------------------------------------
        widths = [self.base_channels * m for m in self.channel_mults]
        def heads_for(channels: int) -> int:
            if self.attn_head_dim is None:
                return self.n_heads
            return min(self.n_heads, max(1, channels // self.attn_head_dim))

        h = DoubleConv(widths[0], dtype=self.dtype,
                       quantized=self.conv_quant,
                       im2col_narrow=self.im2col_narrow,
                       fused_narrow=self.fused_narrow, name="inc")(h)
        skips = [h]
        for i, ch in enumerate(widths[1:] + [widths[-1]], start=1):
            h = Down(ch, dtype=self.dtype, quantized=self.conv_quant,
                     im2col_narrow=self.im2col_narrow,
                     fused_narrow=self.fused_narrow,
                     name=f"down{i}")(h, t_emb)
            if i in self.attention_levels:
                h = ImageSelfAttention(
                    n_heads=heads_for(h.shape[-1]),
                    use_ffn=True,
                    qk_int8=self.conv_quant,
                    pv_int8=self.conv_quant and self.attn_pv_int8,
                    dtype=self.dtype,
                    name=f"sa_down{i}",
                )(h)
            skips.append(h)

        # --- bottleneck ---------------------------------------------------
        mid_ch = self.base_channels * self.bottleneck_mult
        h = DoubleConv(mid_ch, dtype=self.dtype,
                       quantized=self.conv_quant,
                       im2col_narrow=self.im2col_narrow, name="bot1")(h)
        h = DoubleConv(skips[-1].shape[-1], dtype=self.dtype,
                       quantized=self.conv_quant,
                       im2col_narrow=self.im2col_narrow, name="bot2")(h)

        # --- decoder -----------------------------------------------------
        n_levels = len(widths)
        up_widths = list(reversed(widths[:-1])) + [widths[0]]
        for i in range(n_levels):
            skip = skips[-(i + 2)]
            h = Up(up_widths[i], dtype=self.dtype, quantized=self.conv_quant,
                   im2col_narrow=self.im2col_narrow,
                   fused_narrow=self.fused_narrow,
                   name=f"up{i + 1}")(h, skip, t_emb)
            level = n_levels - 1 - i  # resolution level after this Up
            if level in self.attention_levels_up:
                h = ImageSelfAttention(
                    n_heads=heads_for(h.shape[-1]),
                    use_ffn=True,
                    qk_int8=self.conv_quant,
                    pv_int8=self.conv_quant and self.attn_pv_int8,
                    dtype=self.dtype,
                    name=f"sa_up{i + 1}",
                )(h)

        out = nn.Conv(
            self.out_channels, (1, 1), dtype=jnp.float32, name="outc"
        )(h.astype(jnp.float32))
        return out.astype(in_dtype)


__all__ = ["DoubleConv", "Down", "Up", "ConditionalUNet"]
