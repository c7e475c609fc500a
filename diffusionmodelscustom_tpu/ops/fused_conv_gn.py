"""Fused 3x3 conv + GroupNorm(1) + GELU Pallas kernel for narrow maps.

The last named perf lever from round 3 (VERDICT item 3): the flagship's
full-resolution DoubleConvs (64ch at 128x128, models/unet.py — the
reference's DoubleConv pyramid, src/unet_ms.py:5-49) run at only ~33
TF/s under XLA's direct conv because C=64 half-fills the MXU's 128
output lanes (scripts/probe_conv_r3.py). Two earlier attacks failed for
layout reasons, not math reasons:

* width-pair packed conv as an XLA conv (ops/packed_conv.py): 1.58x in
  isolation, REGRESSED in context — XLA layout assignment turned the
  pack/unpack reshapes into relayout copies around every conv.
* Pallas im2col (ops/im2col_conv.py): Mosaic DMA lane alignment forced
  Cin padded to 128 (2x wasted contraction) + 9 VMEM slab copies.

This kernel keeps the packed-pair trick but hides the packing INSIDE
one Pallas kernel: the host-side (B,H,W,C) -> (B,H,W/2,2C) reshape is a
pure row-major bitcast on the HBM buffer (C is minor), the MXU sees
full 128-lane operands, and the unpack on the way out is again a
bitcast — XLA never gets a chance to materialize a relayout. The conv
is 9 shifted (H*W/2, 2C) @ (2C, 2C') matmuls with the block-structured
packed weights of ops/packed_conv.py (2x the dense FLOPs, full lanes),
and the GroupNorm(num_groups=1) + GELU epilogue runs on the f32
accumulator while it is still in VMEM — the whole per-sample map fits
(128x64x128 bf16 = 2 MB), so the norm's global stats need no second
trip to HBM.

Gradients: ``fused_conv_gn_gelu`` carries a custom VJP whose backward
re-derives the gradient from the plain XLA composition (conv + GN +
GELU in jnp) — exact, and the recompute costs one XLA forward, so
training keeps working when the fused path is enabled; the Pallas win
applies to the forward/sampling path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed_conv import pack_conv_weights

# test hook: force the Pallas path in interpret mode off-TPU (CPU tests
# exercise the kernel logic; the TPU probe measures the real thing)
_FORCE_INTERPRET = False

_SQRT_2_OVER_PI = 0.7978845608028654


def _tanh_gelu(x):
    """jax.nn.gelu(approximate=True) — what flax's nn.gelu applies."""
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)))


def _kernel(x_ref, w_ref, g_ref, b_ref, res_ref, out_ref, pad_ref, *,
            eps: float, gelu: bool, residual: bool):
    """One batch element: packed 3x3 conv -> GN(1) -> [+res] -> [GELU]."""
    h = x_ref.shape[1]
    w2 = x_ref.shape[2]
    c2 = x_ref.shape[3]
    co2 = w_ref.shape[2]
    # zero-padded halo copy (same-padding conv); one 2 MB VPU write + one
    # interior store per grid step
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w2 + 1, :] = x_ref[0]
    acc = jnp.zeros((h * w2, co2), jnp.float32)
    for j in range(3):
        # one width-shifted copy per tap column (strided VMEM load); row
        # shifts below are contiguous slices + free leading-dim reshapes
        col = pad_ref[:, j:j + w2, :]
        for kh in range(3):
            a = col[kh:kh + h].reshape(h * w2, c2)
            acc += jnp.dot(
                a, w_ref[3 * kh + j], preferred_element_type=jnp.float32
            )
    # GroupNorm(num_groups=1): stats over ALL of (H, W, C) per sample —
    # in packed layout that is exactly every element of acc. Two-pass
    # mean/var in f32 for parity with flax's GroupNorm numerics.
    mean = jnp.mean(acc)
    var = jnp.mean(jnp.square(acc - mean))
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    if residual:
        y = y + res_ref[0].reshape(h * w2, co2).astype(jnp.float32)
    if gelu:
        y = _tanh_gelu(y)
    out_ref[0] = y.astype(out_ref.dtype).reshape(h, w2, co2)


def _pallas_fused(xp, wk, gp, bp, resp, *, eps, gelu, residual, interpret):
    b, h, w2, c2 = xp.shape
    co2 = wk.shape[2]
    kern = functools.partial(
        _kernel, eps=eps, gelu=gelu, residual=residual
    )
    if residual:
        res_spec = pl.BlockSpec((1, h, w2, co2), lambda i: (i, 0, 0, 0))
    else:
        # unused operand: stream a single tiny block so it costs no VMEM
        resp = resp[:, :1, :1, :]
        res_spec = pl.BlockSpec((1, 1, 1, co2), lambda i: (i, 0, 0, 0))
    # working set per grid step (64ch@128^2 packed site): x 2 MB + pad
    # scratch 2.2 MB + f32 acc 4 MB + out 2 MB (+ res 2 MB) and Mosaic
    # double-buffers the streamed blocks — the default 16 MB scoped VMEM
    # cap rejects it at compile; the real v5e VMEM is 128 MB
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w2, c2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c2, co2), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, co2), lambda i: (0, 0)),
            pl.BlockSpec((1, co2), lambda i: (0, 0)),
            res_spec,
        ],
        out_specs=pl.BlockSpec((1, h, w2, co2), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, co2), xp.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w2 + 2, c2), xp.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, wk, gp, bp, resp)


def _reference(x, w, gamma, beta, res, *, eps, gelu, residual):
    """The exact XLA composition the kernel replaces (used for the VJP
    and as the numerical oracle in tests): bf16 conv with f32
    accumulation semantics -> f32 GN(1) -> [+res] -> [tanh GELU]."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(out - mean), axis=(1, 2, 3), keepdims=True)
    y = (out - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if residual:
        y = y + res.astype(jnp.float32)
    if gelu:
        y = _tanh_gelu(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused(x, w, gamma, beta, res, eps, gelu, residual, interpret):
    xp = x.reshape(x.shape[0], x.shape[1], x.shape[2] // 2, 2 * x.shape[3])
    co = w.shape[3]
    wk = pack_conv_weights(w.astype(x.dtype)).reshape(
        9, 2 * w.shape[2], 2 * co
    )
    gp = jnp.tile(gamma.astype(jnp.float32), 2)[None]
    bp = jnp.tile(beta.astype(jnp.float32), 2)[None]
    resp = (res if residual else jnp.zeros_like(x, shape=x.shape[:3] + (co,)))
    resp = resp.reshape(resp.shape[0], resp.shape[1], resp.shape[2] // 2,
                        2 * co).astype(x.dtype)
    out = _pallas_fused(xp, wk, gp, bp, resp, eps=eps, gelu=gelu,
                        residual=residual, interpret=interpret)
    return out.reshape(x.shape[0], x.shape[1], x.shape[2], co)


def _fused_fwd(x, w, gamma, beta, res, eps, gelu, residual, interpret):
    return (
        _fused(x, w, gamma, beta, res, eps, gelu, residual, interpret),
        (x, w, gamma, beta, res),
    )


def _fused_bwd(eps, gelu, residual, interpret, saved, g):
    x, w, gamma, beta, res = saved
    _, vjp = jax.vjp(
        functools.partial(_reference, eps=eps, gelu=gelu, residual=residual),
        x, w, gamma, beta, res,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_conv_gn_gelu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    residual: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    gelu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``GELU?(GN_1(conv3x3(x)) [+ residual])`` for narrow maps.

    x: (B, H, W, Cin) with W even; w: (3, 3, Cin, Cout) HWIO;
    gamma/beta: (Cout,) GroupNorm(1) scale/bias. ``residual`` (same
    shape as the output) is added AFTER the norm and, when given, the
    trailing GELU applies to the sum — matching DoubleConv's residual
    tail ``gelu(x + gn2(conv2(h)))`` with ``gelu=True``.

    Numerics: bf16 MXU matmuls with f32 accumulation + f32 norm stats,
    like XLA's conv + flax GroupNorm. Differentiable (custom VJP through
    the equivalent XLA composition).
    """
    assert x.ndim == 4 and x.shape[2] % 2 == 0, "needs NHWC with even W"
    assert w.shape[:2] == (3, 3) and w.shape[2] == x.shape[-1]
    interpret = interpret or _FORCE_INTERPRET
    if not interpret and jax.default_backend() != "tpu":
        # off-TPU (CPU tests / virtual-mesh dryruns): the exact XLA
        # composition — same numerics, no Mosaic dependency
        return _reference(
            x, w, gamma, beta,
            residual if residual is not None else 0.0,
            eps=eps, gelu=gelu, residual=residual is not None,
        )
    return _fused(
        x, w, gamma, beta,
        residual if residual is not None else jnp.zeros((0,), x.dtype),
        eps, gelu, residual is not None, interpret,
    )


__all__ = ["fused_conv_gn_gelu"]
