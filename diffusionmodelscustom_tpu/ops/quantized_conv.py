"""Dynamic int8 convolution for the quantized serving path.

The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS peak).
Measured here (chained in-jit, scripts note in CLAUDE.md): a 3x3 conv at
(32,64,64,256) runs 1.22 ms bf16 -> 0.83 ms int8 (127 -> 186 TF/s); the
4096^3 matmul ceiling moves 129 -> 190 TF/s. Narrow-channel (64ch) convs
see no gain (the half-empty output lanes dominate), so quantization is
applied only to >=128-feature convs.

Scheme — dynamic symmetric quantization, zero calibration state:

* weights: per-output-channel int8, s_w[co] = max|W[..., co]| / 127,
  quantized on the fly from the unchanged f32 parameters (a few MB of
  elementwise work per step; the parameter tree, checkpoints, and the
  torch importer are untouched);
* activations: per-tensor int8, s_x = max|x| / 127 computed per call (one
  fused amax pass);
* accumulation in int32 on the MXU, dequantized by s_x * s_w[co] into the
  requested float dtype. XLA fuses the dequant multiply into the consumer
  (typically the following GroupNorm, whose per-sample standardization is
  in fact invariant to the per-tensor part of the scale).

This is an approximation for inference/serving: use it for sampling
(``ConditionalUNet(conv_quant=True)``), never for training — a
custom_vjp raises on any attempt to differentiate through it (without
it, jax.grad would silently produce ZERO gradients through the
round/int8 casts and the wide convs would just stop learning). The
reference has no quantized path (pure fp32 torch, SURVEY.md section 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_conv_kernel(kernel: jnp.ndarray):
    """(kh, kw, Cin, Cout) float -> (int8 kernel, f32 scale[Cout])."""
    k = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_tensor(x: jnp.ndarray):
    """float tensor -> (int8 tensor, f32 scalar scale), per-tensor symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return q, scale


@jax.custom_vjp
def _int8_conv_core(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    qx, sx = quantize_tensor(x)
    qw, sw = quantize_conv_kernel(kernel)
    acc = jax.lax.conv_general_dilated(
        qx,
        qw,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sx * sw)


def _int8_conv_fwd(x, kernel):
    return _int8_conv_core(x, kernel), None


def _int8_conv_bwd(res, g):
    raise NotImplementedError(
        "dynamic_int8_conv3x3 is a serving-only op: differentiating "
        "through the int8 quantizer would yield silent zero gradients. "
        "Train with conv_quant=False and quantize for sampling."
    )


_int8_conv_core.defvjp(_int8_conv_fwd, _int8_conv_bwd)


def dynamic_int8_conv3x3(
    x: jnp.ndarray, kernel: jnp.ndarray, out_dtype=None
) -> jnp.ndarray:
    """3x3 stride-1 same-padding conv computed on the int8 MXU path.

    x: (B, H, W, Cin) float; kernel: (3, 3, Cin, Cout) float (quantized
    internally). Returns float (``out_dtype`` or x.dtype). Serving-only:
    attempting to differentiate raises (see module docstring).
    """
    out_dtype = out_dtype or x.dtype
    return _int8_conv_core(x, kernel).astype(out_dtype)


class DynamicInt8Conv3x3(nn.Module):
    """Serving-time drop-in for ``nn.Conv(features, (3,3), padding=1)``
    — identical parameter names/shapes (``kernel`` and, with
    ``use_bias``, ``bias``), int8 compute; the bias is added in float
    after the dequant (exact, only the matmul is quantized)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        out = dynamic_int8_conv3x3(x, kernel, out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias.astype(out.dtype)
        return out


__all__ = [
    "DynamicInt8Conv3x3",
    "dynamic_int8_conv3x3",
    "quantize_conv_kernel",
    "quantize_tensor",
]
