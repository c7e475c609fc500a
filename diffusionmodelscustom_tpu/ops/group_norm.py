"""Fused GroupNorm(num_groups=1) Pallas kernel.

MEASURED OUTCOME (v5e, round 2): in isolation this kernel beats XLA's
GroupNorm realization, but swapping it into the flagship's DoubleConv
REGRESSED the full 128px train step 13.1 -> 9.9 steps/s — XLA fuses the
norm's elementwise tail into the neighboring convs, which an opaque
pallas_call prevents. The flagship therefore keeps nn.GroupNorm; this op
stays in the library for standalone whole-map normalization workloads
(and as the measured record of the experiment).

The flagship's DoubleConv normalizes the WHOLE feature map per sample
(GroupNorm(1) == the reference's nn.GroupNorm(1, ch), src/unet_ms.py:30-49).
XLA realizes that as separate stat-reduction and normalize passes —
measured ~1.6 ms fwd / 2.1 ms fwd+bwd at (32,128,128,64) bf16, ~5x off the
HBM bound. This kernel keeps the sample resident in VMEM: one read
computes the moments AND writes the normalized output (single HBM
read + write). The backward recomputes x_hat from saved per-sample
moments inside an equally fused kernel.

Layout trick: an NHWC map with C | 128 is viewed as (B, H*W*C/128, 128)
rows of 128 lanes; per-channel gamma/beta are pre-tiled to 128 lanes
(exact because 128 % C == 0, so each lane always holds the same channel).
Channels not dividing 128 fall back to flax GroupNorm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(
    x_ref, g_ref, b_ref, o_ref, stat_ref, sums, *, eps: float, n: int
):
    """Two-phase revisiting grid (b, phase, row_block): phase 0 streams the
    sample accumulating sum/sumsq in SMEM, phase 1 streams it again
    normalizing. Row blocks are small so double-buffered pipeline copies
    fit VMEM (a whole 16k x 128 sample block would need 2x(in+out) = 16 MB)."""
    phase = pl.program_id(1)
    rb = pl.program_id(2)

    @pl.when((phase == 0) & (rb == 0))
    def _init():
        sums[0] = 0.0
        sums[1] = 0.0

    @pl.when(phase == 0)
    def _acc():
        xb = x_ref[0].astype(jnp.float32)
        sums[0] += jnp.sum(xb)
        sums[1] += jnp.sum(xb * xb)

    @pl.when(phase == 1)
    def _norm():
        mean = sums[0] / n
        var = sums[1] / n - mean * mean
        rstd = jax.lax.rsqrt(var + eps)
        xb = x_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)
        b = b_ref[0].astype(jnp.float32)
        o_ref[0] = ((xb - mean) * rstd * g + b).astype(o_ref.dtype)

        @pl.when(rb == 0)
        def _stats():
            rows = jax.lax.broadcasted_iota(jnp.int32, stat_ref.shape[1:], 0)
            stat_ref[0] = jnp.where(
                rows == 0, mean, jnp.where(rows == 1, rstd, 0.0)
            )


def _bwd_kernel(
    x_ref, g_ref, dy_ref, stat_ref, dx_ref, sums, *, n: int
):
    """Same two-phase structure for dx: phase 0 accumulates the two
    reduction terms, phase 1 writes dx."""
    phase = pl.program_id(1)
    rb = pl.program_id(2)
    g = g_ref[0].astype(jnp.float32)
    mean = stat_ref[0][0, 0]
    rstd = stat_ref[0][1, 0]

    @pl.when((phase == 0) & (rb == 0))
    def _init():
        sums[0] = 0.0
        sums[1] = 0.0

    @pl.when(phase == 0)
    def _acc():
        xhat = (x_ref[0].astype(jnp.float32) - mean) * rstd
        dyg = dy_ref[0].astype(jnp.float32) * g
        sums[0] += jnp.sum(dyg)
        sums[1] += jnp.sum(dyg * xhat)

    @pl.when(phase == 1)
    def _write():
        m1 = sums[0] / n
        m2 = sums[1] / n
        xhat = (x_ref[0].astype(jnp.float32) - mean) * rstd
        dyg = dy_ref[0].astype(jnp.float32) * g
        dx_ref[0] = (rstd * (dyg - m1 - xhat * m2)).astype(dx_ref.dtype)


def _flat_view(x: jnp.ndarray):
    b = x.shape[0]
    c = x.shape[-1]
    total = x.size // b
    return x.reshape(b, total // 128, 128), c, total


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gn1(x, gamma, beta, eps):
    y, _ = _gn1_fwd_impl(x, gamma, beta, eps)
    return y


def _row_block(r: int) -> int:
    """Largest power-of-two row block <= 1024 dividing r (double-buffered
    in+out copies stay well under the 16 MB VMEM budget)."""
    rb = 1024
    while r % rb:
        rb //= 2
    return max(rb, 8)


def _gn1_fwd_impl(x, gamma, beta, eps):
    xf, c, n = _flat_view(x)
    b, r, _ = xf.shape
    rb = _row_block(r)
    reps = 128 // c
    g_tile = jnp.tile(gamma, reps).reshape(1, 128)
    b_tile = jnp.tile(beta, reps).reshape(1, 128)
    y, stats = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, n=n),
        grid=(b, 2, r // rb),
        in_specs=[
            pl.BlockSpec((1, rb, 128), lambda i, p, j: (i, j, 0)),
            pl.BlockSpec((1, 128), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, 128), lambda i, p, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, 128), lambda i, p, j: (i, j, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, p, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xf.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(xf, g_tile, b_tile)
    return y.reshape(x.shape), stats


def _gn1_fwd(x, gamma, beta, eps):
    y, stats = _gn1_fwd_impl(x, gamma, beta, eps)
    return y, (x, gamma, stats)


def _gn1_bwd(eps, res, dy):
    x, gamma, stats = res
    xf, c, n = _flat_view(x)
    dyf, _, _ = _flat_view(dy)
    b, r, _ = xf.shape
    reps = 128 // c
    g_tile = jnp.tile(gamma, reps).reshape(1, 128)
    rb = _row_block(r)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, n=n),
        grid=(b, 2, r // rb),
        in_specs=[
            pl.BlockSpec((1, rb, 128), lambda i, p, j: (i, j, 0)),
            pl.BlockSpec((1, 128), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, rb, 128), lambda i, p, j: (i, j, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, p, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, 128), lambda i, p, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(xf, g_tile, dyf, stats)

    # parameter grads: xhat recomputed from saved moments; XLA fuses this
    # into one pass over (x, dy)
    mean = stats[:, 0, 0].reshape(b, *([1] * (x.ndim - 1)))
    rstd = stats[:, 1, 0].reshape(b, *([1] * (x.ndim - 1)))
    xhat = (x.astype(jnp.float32) - mean) * rstd
    dyf32 = dy.astype(jnp.float32)
    red_axes = tuple(range(x.ndim - 1))
    dgamma = jnp.sum(dyf32 * xhat, axis=red_axes).astype(gamma.dtype)
    dbeta = jnp.sum(dyf32, axis=red_axes).astype(gamma.dtype)
    return dx.reshape(x.shape), dgamma, dbeta


_gn1.defvjp(_gn1_fwd, _gn1_bwd)


def fused_group_norm1(
    x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """GroupNorm with a single group over an NHWC map, fused on TPU.

    Requirements for the fused path: channels divide 128 and the per-
    sample element count divides 128; otherwise compute with plain jnp
    (identical math).
    """
    c = x.shape[-1]
    per_sample = x.size // x.shape[0]
    use_kernel = (
        jax.default_backend() == "tpu"
        and c <= 128
        and 128 % c == 0
        and per_sample % 1024 == 0  # rows divisible by the min chunk of 8
    )
    if use_kernel:
        return _gn1(x, gamma, beta, eps)
    axes = tuple(range(1, x.ndim))
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=axes, keepdims=True)
    var = xf.var(axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(
        x.dtype
    )


from flax import linen as nn  # noqa: E402


class GroupNorm1(nn.Module):
    """linen wrapper over :func:`fused_group_norm1` with nn.GroupNorm-
    compatible parameter names (scale/bias), drop-in for
    ``nn.GroupNorm(num_groups=1)``."""

    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        out = fused_group_norm1(x, scale, bias, self.epsilon)
        return out.astype(self.dtype or x.dtype)


__all__ = ["fused_group_norm1", "GroupNorm1"]
