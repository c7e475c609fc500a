"""Width-pair packed 3x3 convolution for narrow-channel maps.

Why: the MXU contracts onto 128 output lanes; a conv with C_out = 64 fills
half of them, and XLA's direct NHWC conv runs at ~33 TF/s on
(32,128,128,64) bf16 vs ~108-137 TF/s for >=128-channel maps (measured on
v5e, scripts/probe_conv_r3.py). The flagship UNet's full-resolution stage
(models/unet.py — the reference DoubleConv pyramid, src/unet_ms.py:30-49)
is exactly such a map, and it dominates the non-attention forward time.

Trick: view the NHWC tensor with W-adjacent pixel pairs packed into the
channel axis — (B, H, W, C) -> (B, H, W/2, 2C) is a free reshape — and
absorb the pixel parity into the conv weights:

    out[b, h, 2*w2+po, co] = sum_{kh,kw,ci} W[kh,kw,ci,co] *
                             x[b, h+kh-1, 2*w2+po+kw-1, ci]

becomes a plain 3x3 conv on the packed tensor with block-structured
weights W2[kh, j, pi*Cin+ci, po*Cout+co] = W[kh, 2j+pi-po+1, ci, co]
(zero where the kw index falls outside [0, 2]). Exactly half the blocks
are populated, so the packed conv does 2x the dense FLOPs of the ideal
3x3 — but with full 128-lane utilization. Measured (v5e, bf16,
scripts/probe_packed_conv.py): 64->64 @ 32x128x128 1.20 -> 0.76 ms
(1.58x); GroupNorm+GELU still fuse into the conv epilogue through the
free unpack reshape (0.825 ms total vs 1.186 unpacked).

MEASURED OUTCOME IN CONTEXT (v5e, round 3): swapping these into the
flagship DoubleConv REGRESSED the full model — forward 20.0 -> 27.3 ms,
train step 67.8 -> 79.1 ms. Inside the full graph XLA assigns different
physical layouts to the surrounding (B,H,W,64) ops, so the pack/unpack
reshapes become relayout copies around every conv, erasing the isolated
win (the same in-context-beats-isolated lesson as the fused GroupNorm
kernel, ops/group_norm.py). The op stays in the library for standalone
narrow-channel conv workloads where the caller controls the layout.

Because this stays a single `lax.conv_general_dilated`, autodiff,
sharding, and XLA fusion all work unchanged; the parameter keeps the
standard (3, 3, Cin, Cout) HWIO shape so checkpoints and the torch
importer are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def pack_conv_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO -> (3, 3, 2*Cin, 2*Cout) packed weights.

    Linear in ``w`` (a gather into a zero tensor), so gradients flow
    through unchanged; each weight element appears exactly twice (once per
    output parity), matching the packed conv's 2x dense FLOP count.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "packed conv is specialized to 3x3 kernels"
    w2 = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    for j in (-1, 0, 1):
        for pi in (0, 1):
            for po in (0, 1):
                k = 2 * j + pi - po + 1
                if 0 <= k <= 2:
                    w2 = w2.at[
                        :,
                        j + 1,
                        pi * cin:(pi + 1) * cin,
                        po * cout:(po + 1) * cout,
                    ].set(w[:, k])
    return w2


def packed_pair_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 same-padding conv, computed width-pair packed.

    x: (B, H, W, Cin) with W even; kernel: (3, 3, Cin, Cout) HWIO.
    Numerically identical to ``lax.conv`` up to float summation order.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert w % 2 == 0, "packed conv needs an even W"
    xp = x.reshape(b, h, w // 2, 2 * cin)
    # no preferred_element_type: the TPU conv accumulates in f32 anyway,
    # and an explicit f32 output breaks the conv VJP's dtype matching for
    # bf16 inputs (f32 cotangent vs bf16 operands)
    out = jax.lax.conv_general_dilated(
        xp,
        pack_conv_weights(kernel),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(b, h, w, cout)


class PackedConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding=1, use_bias=False)``.

    Keeps the identical parameter name/shape ("kernel", (3,3,Cin,Cout)) so
    swapping implementations never invalidates a checkpoint. Routes
    through the packed formulation when it pays (narrow channels, even W)
    and falls back to the direct conv otherwise.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.features < 128 and x.shape[2] % 2 == 0:
            return packed_pair_conv3x3(x, kernel)
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


__all__ = ["pack_conv_weights", "packed_pair_conv3x3", "PackedConv3x3"]
