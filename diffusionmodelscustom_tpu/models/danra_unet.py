"""DANRA UNet family — the reference's main research model, rebuilt NHWC.

Parity target (architecture + math semantics, not weight-for-weight):

* ``Encoder`` — a ResNet-18-style trunk (BasicBlock, layers [2,2,2,2],
  BatchNorm+ReLU) with two 8x8/stride-2 stem convs, per-scale additive
  sinusoidal time projections and self-attention at all five scales, and
  conditioning by channel-concat (cond image / land-sea mask / topography)
  plus an additive season-label embedding
  (modules_DANRA_conditional.py:117-344; clean-app variant with runtime
  cond flags and attention FFN at src/unet.py:129-260).
* ``DecoderBlock``/``Decoder`` — ConvTranspose(k=s=2) -> InstanceNorm ->
  3x3 conv -> InstanceNorm -> additive skip -> additive time embedding ->
  attention -> activation; final block has Identity activation, no
  attention, and no second InstanceNorm
  (modules_DANRA_conditional.py:349-569).
* ``DiffusionNet`` — encoder -> decoder wrapper with the black-box
  signature model(x, t, y, cond_img, lsm, topo) -> predicted noise
  (modules_DANRA_conditional.py:571-616).

TPU-first deltas (documented divergences):

* NHWC layout; convs hit the MXU directly.
* The reference's per-forward Python-loop sinusoidal embedding (hot-spot
  #3 in SURVEY.md section 3) is vectorized.
* Classifier-free guidance uses null conditioning (zeroed cond channels +
  a reserved null label) instead of dropping input channels — the
  reference's uncond branch (src/diffusion_modules.py:158) would change
  the conv1 input arity and cannot work when conditioning is enabled;
  null-cond keeps shapes static for jit and is the standard CFG recipe.
* BatchNorm uses cross-replica (sync-BN) semantics when an ``axis_name``
  is provided, since data-parallel shards see different batch statistics.

Init parity: xavier-uniform kernels with bias 0.01 for all (transpose-)
convs, matching TrainingPipeline weight init
(training_DANRA_conditional.py:739-753).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import ImageSelfAttention
from ..ops.embeddings import pos_encoding_block, sinusoidal_embedding
from ..ops.norms import instance_norm

# Reference init: xavier_uniform for conv kernels, constant 0.01 bias
# (training_DANRA_conditional.py:739-753).
conv_kernel_init = nn.initializers.xavier_uniform()
conv_bias_init = nn.initializers.constant(0.01)

FMAP_CHANNELS = (64, 64, 128, 256, 512)



def _heads_for(n_heads: int, channels: int, attn_head_dim) -> int:
    """TPU-first optional head capping (same knob as the flagship,
    models/unet.py): with ``attn_head_dim`` set, cap the head count so
    head_dim >= attn_head_dim — the MXU contracts over 128 lanes and
    small head dims pad away throughput. Parameter shapes are unchanged
    (the qkv projection is 3C regardless of head count); ``None``
    preserves exact reference head counts."""
    if attn_head_dim is None:
        return n_heads
    return min(n_heads, max(1, channels // attn_head_dim))

class BasicBlock(nn.Module):
    """ResNet-18 BasicBlock: 3x3 conv -> BN -> ReLU -> 3x3 conv -> BN,
    with a 1x1-conv downsample on the shortcut when stride != 1."""

    channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.bn_axis_name if train else None,
                name=name,
            )

        residual = x
        out = nn.Conv(
            self.channels,
            (3, 3),
            strides=self.stride,
            padding=1,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.channels,
            (3, 3),
            padding=1,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = bn("bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.channels:
            residual = nn.Conv(
                self.channels,
                (1, 1),
                strides=self.stride,
                use_bias=False,
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class Encoder(nn.Module):
    """DANRA UNet encoder returning five feature maps (SURVEY.md C3).

    Feature-map channels (64, 64, 128, 256, 512); attention at every
    scale; conditioning by channel concat + additive label embedding.
    """

    time_embedding: int = 256
    n_heads: int = 4
    num_classes: Optional[int] = None
    block_layers: Sequence[int] = (2, 2, 2, 2)
    use_attention_ffn: bool = False  # clean-app (g3) adds a FFN, src/unet.py:92-97
    attn_head_dim: Optional[int] = None  # TPU-first head capping (see _heads_for)
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        cond_img: Optional[jnp.ndarray] = None,
        lsm_cond: Optional[jnp.ndarray] = None,
        topo_cond: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        # Conditioning: channel-concat in the reference's order lsm, topo,
        # cond_img (modules_DANRA_conditional.py:228-240).
        parts = [x]
        if lsm_cond is not None:
            parts.append(lsm_cond.astype(x.dtype))
        if topo_cond is not None:
            parts.append(topo_cond.astype(x.dtype))
        if cond_img is not None:
            parts.append(cond_img.astype(x.dtype))
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x

        # Block-layout sinusoidal embedding with base n=1000
        # (modules_DANRA_conditional.py:203-211), plus label embedding.
        t_emb = pos_encoding_block(t, self.time_embedding, n=1000.0).astype(
            self.dtype
        )
        if self.num_classes is not None and y is not None:
            label = nn.Embed(
                self.num_classes,
                self.time_embedding,
                dtype=self.dtype,
                name="label_emb",
            )(y)
            t_emb = t_emb + label

        def time_proj(channels, name):
            # SiLU -> Linear per scale (modules_DANRA_conditional.py:325-331)
            h = nn.silu(t_emb)
            h = nn.Dense(channels, dtype=self.dtype, name=name)(h)
            return h[:, None, None, :]

        def attn(channels, name):
            return ImageSelfAttention(
                n_heads=_heads_for(self.n_heads, channels, self.attn_head_dim),
                use_ffn=self.use_attention_ffn,
                dtype=self.dtype,
                name=name,
            )

        # Stem conv1: 8x8 stride 2 pad 3, no bias
        # (modules_DANRA_conditional.py:178-183).
        fmap1 = nn.Conv(
            FMAP_CHANNELS[0],
            (8, 8),
            strides=2,
            padding=3,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv1",
        )(x)
        fmap1 = fmap1 + time_proj(FMAP_CHANNELS[0], "time_proj_0")
        fmap1 = attn(FMAP_CHANNELS[0], "attn_0")(fmap1)

        h = nn.Conv(
            FMAP_CHANNELS[1],
            (8, 8),
            strides=2,
            padding=3,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv2",
        )(fmap1)
        h = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name="bn1",
        )(h)
        h = nn.relu(h)

        # Four ResNet stages; strides (1, 2, 2, 2) as in ResNet-18 with
        # channels 64/128/256/512 (torchvision semantics).
        fmaps = [fmap1]
        stage_channels = (64, 128, 256, 512)
        stage_strides = (1, 2, 2, 2)
        for si, (ch, stride, n_blocks) in enumerate(
            zip(stage_channels, stage_strides, self.block_layers)
        ):
            for bi in range(n_blocks):
                h = BasicBlock(
                    channels=ch,
                    stride=stride if bi == 0 else 1,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{si + 1}_block{bi}",
                )(h, train=train)
            h = h + time_proj(ch, f"time_proj_{si + 1}")
            h = attn(ch, f"attn_{si + 1}")(h)
            fmaps.append(h)

        return tuple(fmaps)


class DecoderBlock(nn.Module):
    """Upsample block (SURVEY.md C4): transpose conv 2x -> InstanceNorm ->
    3x3 conv -> InstanceNorm -> +skip -> +t_emb -> attention -> act."""

    output_channels: int
    time_embedding: int = 256
    upsample_scale: int = 2
    compute_attn: bool = True
    use_attention_ffn: bool = False
    final: bool = False  # final block: no 2nd norm, Identity activation
    n_heads: int = 4
    attn_head_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        fmap: jnp.ndarray,
        prev_fmap: Optional[jnp.ndarray] = None,
        t: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        in_ch = fmap.shape[-1]
        out = nn.ConvTranspose(
            in_ch,
            (self.upsample_scale, self.upsample_scale),
            strides=self.upsample_scale,
            kernel_init=conv_kernel_init,
            bias_init=conv_bias_init,
            dtype=self.dtype,
            name="transpose",
        )(fmap)
        out = instance_norm(out)
        out = nn.Conv(
            self.output_channels,
            (3, 3),
            padding=1,
            kernel_init=conv_kernel_init,
            bias_init=conv_bias_init,
            dtype=self.dtype,
            name="conv",
        )(out)
        if not self.final:
            # final layer's instance_norm2 is Identity
            # (modules_DANRA_conditional.py:508-509)
            out = instance_norm(out)

        if prev_fmap is not None:
            assert prev_fmap.shape == out.shape, "feature maps must match"
            out = out + prev_fmap

        if t is not None:
            # Interleaved sinusoidal embedding, base n=10000
            # (modules_DANRA_conditional.py:397-404,447-453).
            t_emb = sinusoidal_embedding(t, self.time_embedding).astype(self.dtype)
            t_emb = nn.silu(t_emb)
            t_emb = nn.Dense(
                self.output_channels, dtype=self.dtype, name="time_proj"
            )(t_emb)
            out = out + t_emb[:, None, None, :]
            if self.compute_attn:
                out = ImageSelfAttention(
                    n_heads=_heads_for(
                        self.n_heads, out.shape[-1], self.attn_head_dim
                    ),
                    use_ffn=self.use_attention_ffn,
                    dtype=self.dtype,
                    name="attn",
                )(out)

        if not self.final:
            out = nn.relu(out)
        return out


class Decoder(nn.Module):
    """Four residual DecoderBlocks (512->256->128->64->64) + a final
    attention-free block to output channels (SURVEY.md C5)."""

    output_channels: int = 1
    time_embedding: int = 256
    last_fmap_channels: int = 512
    first_fmap_channels: int = 64
    n_heads: int = 4
    use_attention_ffn: bool = False
    attn_head_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, *fmaps, t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        fmaps = list(reversed(fmaps))  # fmap5, fmap4, fmap3, fmap2, fmap1

        # channel plan 512 -> 256 -> 128 -> 64 -> 64
        # (modules_DANRA_conditional.py:549-556)
        n = 4
        in_ch = self.last_fmap_channels
        out = None
        for i in range(n):
            out_ch = in_ch // 2 if i != n - 1 else self.first_fmap_channels
            block = DecoderBlock(
                output_channels=out_ch,
                time_embedding=self.time_embedding,
                compute_attn=True,
                use_attention_ffn=self.use_attention_ffn,
                n_heads=self.n_heads,
                attn_head_dim=self.attn_head_dim,
                dtype=self.dtype,
                name=f"residual_{i}",
            )
            src = fmaps[i] if i == 0 else out
            out = block(src, fmaps[i + 1], t)
            in_ch = out_ch

        out = DecoderBlock(
            output_channels=self.output_channels,
            time_embedding=self.time_embedding,
            compute_attn=False,
            final=True,
            n_heads=self.n_heads,
            dtype=self.dtype,
            name="final",
        )(out)
        return out


class DiffusionNet(nn.Module):
    """Encoder->Decoder noise-prediction UNet (SURVEY.md C6).

    Signature parity with the reference black-box callable:
    model(x, t, y, cond_img, lsm_cond, topo_cond) -> predicted noise
    (modules_DANRA_conditional.py:597-616). NHWC arrays.
    """

    output_channels: int = 1
    time_embedding: int = 256
    n_heads: int = 4
    num_classes: Optional[int] = None
    use_attention_ffn: bool = False
    # TPU-first optional head capping (None = exact reference parity);
    # parameter shapes are head-count independent, so a trained/imported
    # checkpoint runs unchanged with any setting. Measured (v5e, 64px
    # batch 16 bf16 fwd): 2.48 -> 1.75 ms with attn_head_dim=128 (1.42x)
    attn_head_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        cond_img: Optional[jnp.ndarray] = None,
        lsm_cond: Optional[jnp.ndarray] = None,
        topo_cond: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        fmaps = Encoder(
            time_embedding=self.time_embedding,
            n_heads=self.n_heads,
            num_classes=self.num_classes,
            use_attention_ffn=self.use_attention_ffn,
            attn_head_dim=self.attn_head_dim,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="encoder",
        )(x, t, y, cond_img, lsm_cond, topo_cond, train=train)
        out = Decoder(
            output_channels=self.output_channels,
            time_embedding=self.time_embedding,
            n_heads=self.n_heads,
            use_attention_ffn=self.use_attention_ffn,
            attn_head_dim=self.attn_head_dim,
            dtype=self.dtype,
            name="decoder",
        )(*fmaps, t=t)
        return out


__all__ = ["BasicBlock", "Encoder", "DecoderBlock", "Decoder", "DiffusionNet"]
