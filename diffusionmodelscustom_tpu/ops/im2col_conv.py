"""Pallas im2col 3x3 convolution for narrow-channel / high-resolution maps.

Why: XLA's direct conv at 64ch@128x128 runs ~33 TF/s on v5e (measured,
scripts/probe_conv_r3.py) — the MXU contracts over Cin=64, half the
128-lane width, and Cout=64 fills half the output columns. Folding the
3x3 taps into the contraction (im2col: K = 9*Cin = 576) packs the lanes
4.5x deeper; the remaining loss is the unavoidable Cout<128 column waste.

MEASURED NEGATIVE (v5e-1, round 5 — scripts/probe_im2col_r2.py): the
kernel LOSES to XLA's direct conv at every flagship shape — 0.55x at
64ch@128^2 (4.57 vs 2.50 ms), 0.70x at 128->64, 0.85x at 128ch@64^2 —
and in-context the flagship forward regresses 21.3 -> 33.1 ms. Root
cause: Mosaic's DMA lane alignment forces Cin padded to 128, doubling
the contraction for 64-channel convs (K=9*128=1152, half zeros), and
the 9 per-tile VMEM slab copies add VPU traffic the XLA conv doesn't
pay. This is the THIRD measured negative on the narrow-conv lever
(width-pair packed conv, pure-JAX shifted matmuls, Pallas im2col) —
XLA's direct conv is the in-context optimum on this hardware. The op
stays as a tested library capability; ``im2col_narrow`` defaults False.

Why previous reformulations failed and this one shouldn't (pre-measure
rationale, kept for the record):
* width-pair packed conv (ops/packed_conv.py) won 1.6x in isolation but
  regressed the full model — its pack/unpack reshapes became XLA relayout
  copies at every call site. This kernel consumes the plain NHWC bf16
  buffer XLA already has (only a 1px spatial jnp.pad on the input) and
  emits plain NHWC, so there is nothing to relayout.
* pure-JAX shifted-matmul im2col (scripts/probe_packed_conv.py) was 2-3x
  slower — the 9 shifted operand copies are HBM traffic. Here the 9 tap
  copies are VMEM->VMEM inside the kernel, behind one DMA of the tile.

Kernel shape: grid (B, H/TH); each step DMAs a (TH+2, W+2, C) haloed row
tile from HBM, builds the (TH*W, 9C) patch slab with 9 static VMEM
copies, and runs a single MXU matmul against the (9C, Cout) reshaped
kernel. f32 accumulation; bf16 operands at full MXU rate.

The backward is the exact XLA conv VJP (this op is exact, not an
approximation — usable in training), via jax.vjp over
lax.conv_general_dilated in the custom_vjp bwd.

Reference target: the DoubleConv hot loop, DDPM_clean_application/
src/unet_ms.py:30-49 (SURVEY.md hot-loop #1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_H = 8
# test hook: force the Pallas path in interpret mode off-TPU (CPU tests
# exercise the kernel logic; the TPU probe measures the real thing)
_FORCE_INTERPRET = False


def _reference_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _im2col_kernel(x_hbm, w_ref, o_ref, xs, p_scr, sem, *, tile_h, w_dim, cin):
    b = pl.program_id(0)
    h = pl.program_id(1)
    # haloed row tile: padded input rows [h*TH, h*TH + TH + 2). The HBM
    # slice must be (8,128)-tile aligned in the trailing dims (Mosaic DMA
    # rule), which _im2col_conv_fwd_impl guarantees by padding W+2 up to a
    # multiple of 8; the row-dim slice here is unconstrained.
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(h * tile_h, tile_h + 2)], xs, sem
    )
    cp.start()
    cp.wait()
    # patch slab P[th, w, tap*C + c] = x[h*TH + th + dy, w + dx, c]
    for tap in range(9):
        dy, dx = divmod(tap, 3)
        p_scr[:, :, tap * cin:(tap + 1) * cin] = xs[
            dy:dy + tile_h, dx:dx + w_dim, :
        ]
    p = p_scr[:].reshape(tile_h * w_dim, 9 * cin)
    acc = jax.lax.dot_general(
        p,
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = acc.reshape(tile_h, w_dim, -1).astype(o_ref.dtype)


def _im2col_conv_fwd_impl(x, kernel, tile_h):
    b, hh, ww, cin = x.shape
    cout = kernel.shape[-1]
    # Mosaic DMA alignment: the per-row-tile HBM slice must be tile-aligned
    # in the trailing (8, 128) dims — pad W+2 up to a sublane multiple and
    # C up to a lane multiple (the HBM layout is lane-padded anyway; the
    # extra contraction rows carry zero weights so the matmul is exact).
    w_tail = (-(ww + 2)) % 8
    c_pad = (-cin) % 128
    cin_p = cin + c_pad
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + w_tail), (0, c_pad)))
    wmat = (
        jnp.pad(kernel, ((0, 0), (0, 0), (0, c_pad), (0, 0)))
        .reshape(9 * cin_p, cout)
        .astype(x.dtype)
    )
    grid = (b, hh // tile_h)
    return pl.pallas_call(
        functools.partial(
            _im2col_kernel, tile_h=tile_h, w_dim=ww, cin=cin_p
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * cin_p, cout), lambda bb, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, ww, cout), lambda bb, h: (bb, h, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, ww + 2 + w_tail, cin_p), x.dtype),
            pltpu.VMEM((tile_h, ww, 9 * cin_p), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_FORCE_INTERPRET,
    )(xp, wmat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _im2col_conv(x, kernel, tile_h):
    return _im2col_conv_fwd_impl(x, kernel, tile_h)


def _im2col_fwd(x, kernel, tile_h):
    return _im2col_conv(x, kernel, tile_h), (x, kernel)


def _im2col_bwd(tile_h, res, g):
    # exact conv VJP through XLA (the kernel computes the exact conv, so
    # the XLA conv's cotangents are its cotangents)
    x, kernel = res
    _, vjp = jax.vjp(lambda xx, kk: _reference_conv(xx, kk), x, kernel)
    dx, dk = vjp(g.astype(x.dtype))
    return dx, dk.astype(kernel.dtype)


_im2col_conv.defvjp(_im2col_fwd, _im2col_bwd)


def im2col_conv3x3(
    x: jnp.ndarray, kernel: jnp.ndarray, tile_h: int = DEFAULT_TILE_H
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv via the Pallas im2col kernel.

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout). Exact (not quantized);
    differentiable (backward runs the XLA conv VJP). Falls back to the
    XLA conv off-TPU or when H doesn't tile.
    """
    b, hh, ww, cin = x.shape
    use_kernel = (
        (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
        and hh % tile_h == 0
        and hh >= tile_h
    )
    if not use_kernel:
        return _reference_conv(x, kernel)
    return _im2col_conv(x, kernel.astype(x.dtype), tile_h)


class Im2ColConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding=1, use_bias=False)``
    — identical parameter name/shape ("kernel", (3,3,Cin,Cout) f32), so
    trained checkpoints load either way."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        return im2col_conv3x3(x.astype(self.dtype), kernel).astype(self.dtype)


__all__ = ["Im2ColConv3x3", "im2col_conv3x3"]
