"""Fused GroupNorm(G) + FiLM + SiLU + 3x3 conv Pallas kernel (prologue
order) for narrow maps — the imagen ResnetBlock's compute unit.

``ops/fused_conv_gn.py`` fuses the flagship DoubleConv's *epilogue*
order (conv -> GN(1) -> GELU).  The imagen-pytorch ResnetBlock
(reference ``CascadedDDPM/imagen_pytorch.py:1498-1650``, ours
``models/imagen/unet.py:108``) runs the opposite composition per block:

    GroupNorm(groups) -> [FiLM scale/shift] -> SiLU -> conv3x3 (+bias)

and its narrow sites — the SR-stage level-0 maps, 64ch at the full
output resolution — are the cascade's measured MFU sink (SR forward 57
TF/s vs base 74, round-4 probe; the 64ch conv itself runs ~33 TF/s
under XLA because C=64 half-fills the MXU's 128 lanes,
``scripts/probe_conv_r3.py``).

Same packing trick as fused_conv_gn: the host-side (B,H,W,C) ->
(B,H,W/2,2C) reshape is a row-major bitcast on the HBM buffer, the MXU
sees full 128-lane operands, the unpack out is again a bitcast.  The
norm runs *inside* the kernel on the VMEM-resident input: per-group
statistics are two per-lane reductions folded to per-group values with
a one-hot (2C, G) matmul (group membership of packed lane k is
``(k mod C) // (C//G)`` — a tiny constant operand, MXU-friendly, no
lane-splitting reshapes for Mosaic to choke on), broadcast back to
lanes by the transposed one-hot.  The normalized/activated map is
written into the same zero-padded halo scratch the conv taps read, so
nothing round-trips HBM between the norm and the conv.

Gradients: custom VJP recomputes through the exact XLA composition
(flax GroupNorm numerics -> FiLM -> SiLU -> lax conv + bias), so the
fused path stays differentiable; the Pallas win targets the
forward/sampling path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed_conv import pack_conv_weights

# test hook: force the Pallas path in interpret mode off-TPU
_FORCE_INTERPRET = False


def _kernel(x_ref, w_ref, g_ref, b_ref, fs_ref, fh_ref, bias_ref, oh_ref,
            oht_ref, out_ref, pad_ref, *, eps: float, film: bool,
            cnt: float):
    """One batch element: GN(G) -> [FiLM] -> SiLU -> packed 3x3 conv."""
    h = x_ref.shape[1]
    w2 = x_ref.shape[2]
    c2 = x_ref.shape[3]
    co2 = w_ref.shape[2]
    x2d = x_ref[0].reshape(h * w2, c2).astype(jnp.float32)
    # per-group stats via per-lane sums folded with the one-hot (2C,Gp):
    # each group owns 2*(C/G) packed lanes and h*w2 pixels per lane.
    # Gp is the group count padded to a full 128-lane vector; empty pad
    # groups produce rstd = rsqrt(eps) but zero membership on the way
    # back to lanes, so they contribute nothing.
    s1 = jnp.sum(x2d, axis=0, keepdims=True)            # (1, 2C)
    s2 = jnp.sum(x2d * x2d, axis=0, keepdims=True)
    gmean = jnp.dot(s1, oh_ref[...]) / cnt              # (1, Gp)
    gex2 = jnp.dot(s2, oh_ref[...]) / cnt
    grstd = jax.lax.rsqrt(gex2 - gmean * gmean + eps)
    mean_l = jnp.dot(gmean, oht_ref[...])               # (1, 2C)
    rstd_l = jnp.dot(grstd, oht_ref[...])
    y = (x2d - mean_l) * rstd_l
    y = y * g_ref[0] + b_ref[0]
    if film:
        y = y * (fs_ref[0] + 1.0) + fh_ref[0]
    y = y * jax.nn.sigmoid(y)  # SiLU
    # zero-padded halo copy of the activated map; conv taps read from it
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w2 + 1, :] = y.astype(pad_ref.dtype).reshape(h, w2, c2)
    acc = jnp.zeros((h * w2, co2), jnp.float32)
    for j in range(3):
        col = pad_ref[:, j:j + w2, :]
        for kh in range(3):
            a = col[kh:kh + h].reshape(h * w2, c2)
            acc += jnp.dot(
                a, w_ref[3 * kh + j], preferred_element_type=jnp.float32
            )
    acc = acc + bias_ref[0]
    out_ref[0] = acc.astype(out_ref.dtype).reshape(h, w2, co2)


def _pallas_fused(xp, wk, gp, bp, fsp, fhp, biasp, oh, oht, *, eps, film,
                  groups, interpret):
    b, h, w2, c2 = xp.shape
    co2 = wk.shape[2]
    cnt = float(h * w2 * c2 // groups)  # elements per group (packed)
    kern = functools.partial(_kernel, eps=eps, film=film, cnt=cnt)
    # FiLM operands are (B, 1, 2C): batch on the LEADING (grid-blocked)
    # axis so the block's last two dims (1, 2C) equal the array dims —
    # Mosaic rejects a (1, 2C) block over a (B, 2C) array (sub-8 block on
    # the second-minor dim). Caught on real TPU lowering, round 5.
    if film:
        film_spec = pl.BlockSpec((1, 1, c2), lambda i: (i, 0, 0))
    else:
        film_spec = pl.BlockSpec((1, 1, c2), lambda i: (0, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w2, c2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c2, co2), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c2), lambda i: (0, 0)),
            pl.BlockSpec((1, c2), lambda i: (0, 0)),
            film_spec,
            film_spec,
            pl.BlockSpec((1, co2), lambda i: (0, 0)),
            pl.BlockSpec((c2, oh.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((oht.shape[0], c2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w2, co2), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, co2), xp.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w2 + 2, c2), xp.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, wk, gp, bp, fsp, fhp, biasp, oh, oht)


def _reference(x, w, gamma, beta, fscale, fshift, bias, *, eps, film,
               groups):
    """The exact XLA composition the kernel replaces (VJP backward and
    numerical oracle): flax-GroupNorm numerics -> FiLM -> SiLU -> conv."""
    b, h, wdt, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * wdt, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, wdt, c)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if film:
        y = y * (fscale[:, None, None, :].astype(jnp.float32) + 1.0) + \
            fshift[:, None, None, :].astype(jnp.float32)
    y = jax.nn.silu(y)
    out = jax.lax.conv_general_dilated(
        y.astype(x.dtype), w.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _group_onehot(c: int, groups: int) -> np.ndarray:
    """(2C, Gp) f32 membership matrix for packed lanes (lane k belongs
    to group ``(k mod C) // (C // G)``); group axis padded to a full
    128-lane vector so Mosaic sees aligned operands."""
    lanes = np.arange(2 * c)
    grp = (lanes % c) // (c // groups)
    gp = max(128, groups)
    return (grp[:, None] == np.arange(gp)[None, :]).astype(np.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused(x, w, gamma, beta, fscale, fshift, bias, eps, film, groups,
           interpret):
    b, h, wdt, c = x.shape
    co = w.shape[3]
    xp = x.reshape(b, h, wdt // 2, 2 * c)
    wk = pack_conv_weights(w.astype(x.dtype)).reshape(9, 2 * c, 2 * co)
    gp = jnp.tile(gamma.astype(jnp.float32), 2)[None]
    bp = jnp.tile(beta.astype(jnp.float32), 2)[None]
    if film:
        fsp = jnp.tile(fscale.astype(jnp.float32), (1, 2))[:, None, :]
        fhp = jnp.tile(fshift.astype(jnp.float32), (1, 2))[:, None, :]
    else:
        fsp = jnp.zeros((1, 1, 2 * c), jnp.float32)
        fhp = jnp.zeros((1, 1, 2 * c), jnp.float32)
    biasp = jnp.tile(bias.astype(jnp.float32), 2)[None]
    oh_np = _group_onehot(c, groups)
    oh = jnp.asarray(oh_np)
    oht = jnp.asarray(np.ascontiguousarray(oh_np.T))
    out = _pallas_fused(xp, wk, gp, bp, fsp, fhp, biasp, oh, oht, eps=eps,
                        film=film, groups=groups, interpret=interpret)
    return out.reshape(b, h, wdt, co)


def _fused_fwd(x, w, gamma, beta, fscale, fshift, bias, eps, film, groups,
               interpret):
    return (
        _fused(x, w, gamma, beta, fscale, fshift, bias, eps, film, groups,
               interpret),
        (x, w, gamma, beta, fscale, fshift, bias),
    )


def _fused_bwd(eps, film, groups, interpret, saved, g):
    x, w, gamma, beta, fscale, fshift, bias = saved
    _, vjp = jax.vjp(
        functools.partial(_reference, eps=eps, film=film, groups=groups),
        x, w, gamma, beta, fscale, fshift, bias,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_gn_silu_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    groups: int = 8,
    film_scale: Optional[jnp.ndarray] = None,
    film_shift: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``conv3x3(silu(film(GN_groups(x)))) + bias`` for narrow maps.

    x: (B, H, W, Cin) with W even and Cin % groups == 0; w: (3, 3, Cin,
    Cout) HWIO; gamma/beta: (Cin,) GroupNorm scale/bias; bias: (Cout,).
    ``film_scale``/``film_shift``: optional per-sample (B, Cin) FiLM
    applied as ``y * (scale + 1) + shift`` after the norm — the imagen
    ResnetBlock's time conditioning (models/imagen/unet.py:136-152).

    Numerics: f32 norm stats + bf16 MXU matmuls with f32 accumulation,
    matching flax GroupNorm + XLA conv. Differentiable (custom VJP
    through the equivalent XLA composition).
    """
    assert x.ndim == 4 and x.shape[2] % 2 == 0, "needs NHWC with even W"
    assert w.shape[:2] == (3, 3) and w.shape[2] == x.shape[-1]
    assert x.shape[-1] % groups == 0
    film = film_scale is not None
    if film:
        assert film_shift is not None and film_scale.shape == (
            x.shape[0], x.shape[-1]
        )
    interpret = interpret or _FORCE_INTERPRET
    if not interpret and jax.default_backend() != "tpu":
        return _reference(
            x, w, gamma, beta,
            film_scale if film else jnp.zeros((x.shape[0], x.shape[-1])),
            film_shift if film else jnp.zeros((x.shape[0], x.shape[-1])),
            bias, eps=eps, film=film, groups=groups,
        )
    z = jnp.zeros((x.shape[0], x.shape[-1]), jnp.float32)
    return _fused(
        x, w, gamma, beta,
        film_scale if film else z, film_shift if film else z,
        bias, eps, film, groups, interpret,
    )


__all__ = ["fused_gn_silu_conv"]
