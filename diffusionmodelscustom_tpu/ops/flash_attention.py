"""Fused flash-attention Pallas kernel for TPU.

Replaces the reference's ``nn.MultiheadAttention`` materialized-logits path
(modules_DANRA_conditional.py:89-105 — the #1 training hotspot per
SURVEY.md section 3) with an online-softmax kernel: the (S x S) logit
matrix never exists, and K/V stream through VMEM in blocks (grid dimension
with carried accumulators), so VMEM use is O(block) regardless of sequence
length — full-domain maps (128x128 -> S=16384) fit fine. The backward is
a pair of Pallas kernels (dQ and dK/dV) recomputing softmax weights from
the saved per-row logsumexp, so no O(S^2) residual ever exists.

Shapes in this workload are image-token attention: S = H*W up to ~16k,
head_dim typically 16..128. Head dims are zero-padded to the 128-lane MXU
width in the wrapper (zero padding is exact: it adds nothing to q.k'
logits and produces output columns that are sliced away). Sequences
shorter than 512 (or not divisible by the block sizes) fall back to a
jnp einsum, where XLA's fusion is already at speed of light.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block sizes aligned to the 8x128 f32 / 16x128 bf16 VMEM tiles.
# Swept on v5e (scripts/sweep_attn_r3.py, rounds 2-3): (1024, 1024) wins
# or ties at every flagship shape — S4096 D128 fwd 3.50 ms vs 3.68 at
# 512/1024, S1024 D128 fwd 1.75 ms vs 2.78 (fewer grid cells amortize the
# per-block softmax state handling; one K block at S<=1024 removes the
# online-softmax carry entirely). bq/bk=2048 combos VMEM-OOM in the
# backward (18.7 MB scoped > 16 MB); 1024 is the usable maximum.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
_NEG_INF = -1e30
# softmax in base 2: the VPU evaluates exp2 cheaper than exp, and at
# D=128 the forward is exp-bound (B*H*S^2 exps vs the matmuls' MXU time).
# exp(x) == exp2(x * log2(e)); the log2(e) factor is folded into sm_scale.
_LOG2_E = 1.4426950408889634


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, sm_scale: float
):
    """Grid (bh, q_blocks, k_blocks); the k dimension is sequential
    ("arbitrary") and carries the online-softmax state in VMEM scratch.
    Also emits the per-row logsumexp (LSE) so the backward can recompute
    softmax weights without a second online pass."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # matmul inputs stay in the arrival dtype (bf16 in training) — the MXU
    # runs bf16 at full rate with f32 accumulation via
    # preferred_element_type; casting to f32 first quarters throughput
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)

    # base-2 softmax: s2 = logits * log2(e); p = exp2(s2 - m2) == softmax
    # numerator in base e (exp2 is the cheap VPU transcendental)
    s2 = (sm_scale * _LOG2_E) * jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK) f32

    m_prev = m_scr[:]  # (BQ, 1), base-2 running max
    l_prev = l_scr[:]
    m_cur = jnp.max(s2, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s2 - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
        # LSE in base e (backward contract); per-row but TPU blocks need a
        # 128-lane last dim, so replicate across lanes (backward reads lane 0)
        lse = (m_scr[:] + jnp.log2(l_scr[:])) / _LOG2_E  # (BQ, 1)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_bhsd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int,
    block_k: int,
):
    """Flash attention on (BH, S, D) slabs; S divisible by both block sizes.

    Returns (out, lse): lse is the per-row logsumexp (BH, S) consumed by
    the Pallas backward kernels.
    """
    bh, s, d = q.shape
    sm_scale = d ** -0.5  # scale by the *unpadded* head dim

    d_pad = max(128, ((d + 127) // 128) * 128)
    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, d_pad - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))

    grid = (bh, s // block_q, s // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
            pl.BlockSpec((1, block_q, 128), lambda i, j, kb: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, s, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    return out[:, :, :d], lse


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, sm_scale: float
):
    """Grid (bh, k_blocks, q_blocks); q sequential, accumulating dK/dV for
    one K/V block. Softmax weights are recomputed from the saved LSE —
    no O(S^2) residual ever exists (FlashAttention backward, dK/dV half)."""
    jq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(jq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # (BQ, D) — bf16 inputs feed the MXU directly
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]
    do = do_ref[0]  # (BQ, D)
    lse = lse_ref[0][:, :1]  # (BQ, 1) — lane-replicated input
    delta = delta_ref[0][:, :1]  # (BQ, 1)

    s2 = (sm_scale * _LOG2_E) * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK) f32, base-2 domain
    p = jnp.exp2(s2 - lse * _LOG2_E)
    p_lo = p.astype(v.dtype)
    # dV += P^T dO
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP = dO V^T ; dS = P * (dP - delta) * scale
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
    # dK += dS^T Q
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(jq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, sm_scale: float
):
    """Grid (bh, q_blocks, k_blocks); k sequential, accumulating dQ for one
    Q block (FlashAttention backward, dQ half)."""
    jk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(jk == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s2 = (sm_scale * _LOG2_E) * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp2(s2 - lse * _LOG2_E)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(jk == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_bhsd(q, k, v, o, lse, g, block_q: int, block_k: int):
    """Pallas flash backward on (BH, S, D) slabs -> (dq, dk, dv)."""
    bh, s, d = q.shape
    sm_scale = d ** -0.5
    # delta_i = rowsum(dO * O): tiny elementwise+reduce, XLA fuses it.
    # Lane-replicated to 128 to satisfy TPU block tiling (as lse is).
    delta = jnp.broadcast_to(
        jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[..., None],
        (bh, s, 128),
    )

    d_pad = max(128, ((d + 127) // 128) * 128)
    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, d_pad - d)]
        q, k, v, g = (jnp.pad(x, pad) for x in (q, k, v, g))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, sm_scale=sm_scale),
        grid=(bh, s // block_k, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, jk, jq: (i, jq, 0)),  # q
            pl.BlockSpec((1, block_k, d_pad), lambda i, jk, jq: (i, jk, 0)),  # k
            pl.BlockSpec((1, block_k, d_pad), lambda i, jk, jq: (i, jk, 0)),  # v
            pl.BlockSpec((1, block_q, d_pad), lambda i, jk, jq: (i, jq, 0)),  # do
            pl.BlockSpec((1, block_q, 128), lambda i, jk, jq: (i, jq, 0)),  # lse
            pl.BlockSpec((1, block_q, 128), lambda i, jk, jq: (i, jq, 0)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d_pad), lambda i, jk, jq: (i, jk, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, jk, jq: (i, jk, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, s, d_pad), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, g, lse, delta)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, sm_scale=sm_scale),
        grid=(bh, s // block_q, s // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, jq, jk: (i, jq, 0)),  # q
            pl.BlockSpec((1, block_k, d_pad), lambda i, jq, jk: (i, jk, 0)),  # k
            pl.BlockSpec((1, block_k, d_pad), lambda i, jq, jk: (i, jk, 0)),  # v
            pl.BlockSpec((1, block_q, d_pad), lambda i, jq, jk: (i, jq, 0)),  # do
            pl.BlockSpec((1, block_q, 128), lambda i, jq, jk: (i, jq, 0)),  # lse
            pl.BlockSpec((1, block_q, 128), lambda i, jq, jk: (i, jq, 0)),  # delta
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, jq, jk: (i, jq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, g, lse, delta)

    return dq[:, :, :d], dk[:, :, :d], dv[:, :, :d]


def _reference_attention(q, k, v):
    """jnp fallback; identical math, logits materialized (fine for tiny S)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


# ---------------------------------------------------------------- int8 QK
# Serving-mode QK quantization: the v5e MXU runs int8 at 2x the bf16 rate
# (394 vs 197 TOPS); the logit matmul is half the attention FLOPs. Dynamic
# symmetric per-(batch*head) quantization, same zero-calibration scheme as
# ops/quantized_conv.py; softmax statistics stay f32, PV stays bf16.


def _quantize_rows(x: jnp.ndarray):
    """(BH, S, D) float -> (int8, f32 scale (BH, 1)) per-slab symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[:, None, None]), -127, 127
    ).astype(jnp.int8)
    return q, scale.reshape(-1, 1)


def _flash_kernel_i8(
    q_ref, k_ref, v_ref, sc_ref, o_ref, m_scr, l_scr, acc_scr
):
    """int8-QK forward: logits accumulate in int32 on the MXU and are
    dequantized by the per-slab combined scale (s_q * s_k * sm_scale *
    log2e, precomputed outside). Same online softmax as _flash_kernel;
    no LSE output (the int8 path is serving-only, no backward)."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, D) int8
    k = k_ref[0]  # (BK, D) int8
    v = v_ref[0]  # (BK, D) bf16/f32
    sc = sc_ref[0, 0, 0]  # f32 combined dequant scale (base-2 domain)

    s2 = sc * jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(s2, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s2 - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _flash_bhsd_i8(q, k, v, block_q: int, block_k: int):
    """int8-QK flash forward on (BH, S, D) float slabs."""
    bh, s, d = q.shape
    sm_scale = d ** -0.5
    qi, sq = _quantize_rows(q)
    ki, sk = _quantize_rows(k)
    # combined scale per slab, already in the base-2 softmax domain
    sc = (sq * sk * (sm_scale * _LOG2_E)).astype(jnp.float32)  # (BH, 1)
    sc = sc.reshape(bh, 1, 1)  # 3D so the (1,1,1) block satisfies the
    # TPU block-shape rule (last two dims equal the array's)

    d_pad = max(128, ((d + 127) // 128) * 128)
    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, d_pad - d)]
        qi, ki = (jnp.pad(x, pad) for x in (qi, ki))
        v = jnp.pad(v, pad)

    grid = (bh, s // block_q, s // block_k)
    out = pl.pallas_call(
        _flash_kernel_i8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, j, kb: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d_pad), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qi, ki, v, sc)
    return out[:, :, :d]


def _flash_kernel_i8pv(
    q_ref, k_ref, v_ref, sc_ref, sv_ref, o_ref, m_scr, l_scr, acc_scr
):
    """int8 QK *and* PV forward: both matmuls run at the MXU's int8 rate.

    The softmax probabilities are quantized per (row, K-block) with the
    local row max as the scale (p_norm = exp2(s2 - m_cur) is in (0, 1],
    so round(p_norm * 127) uses the full int8 range in every block) —
    a diffuse row whose block is far below the running max contributes
    through the f32 ``rowmax = exp2(m_cur - m_new)`` rescale instead of
    rounding to zero, the failure mode of quantizing against the global
    max. Numerator and denominator both use the quantized p, so the
    1/127 factors cancel in the finalize; V's per-slab scale is applied
    once at the end.
    """
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, D) int8
    k = k_ref[0]  # (BK, D) int8
    v = v_ref[0]  # (BK, D) int8
    sc = sc_ref[0, 0, 0]  # f32 combined QK dequant scale (base-2 domain)

    s2 = sc * jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(s2, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    rowmax = jnp.exp2(m_cur - m_new)  # (BQ, 1) block's weight vs history
    p_i8 = jnp.round(jnp.exp2(s2 - m_cur) * 127.0).astype(jnp.int8)
    pv = jax.lax.dot_general(
        p_i8,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    l_new = l_prev * alpha + (
        jnp.sum(p_i8.astype(jnp.float32), axis=-1, keepdims=True) * rowmax
    )
    acc_scr[:] = acc_scr[:] * alpha + pv * rowmax
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kb == nk - 1)
    def _finalize():
        sv = sv_ref[0, 0, 0]
        o_ref[0] = (acc_scr[:] / l_scr[:] * sv).astype(o_ref.dtype)


def _flash_bhsd_i8pv(q, k, v, block_q: int, block_k: int):
    """int8 QK+PV flash forward on (BH, S, D) float slabs."""
    bh, s, d = q.shape
    out_dtype = v.dtype
    sm_scale = d ** -0.5
    qi, sq = _quantize_rows(q)
    ki, sk = _quantize_rows(k)
    vi, sv = _quantize_rows(v)
    sc = (sq * sk * (sm_scale * _LOG2_E)).astype(jnp.float32).reshape(bh, 1, 1)
    svr = sv.astype(jnp.float32).reshape(bh, 1, 1)

    d_pad = max(128, ((d + 127) // 128) * 128)
    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, d_pad - d)]
        qi, ki, vi = (jnp.pad(x, pad) for x in (qi, ki, vi))

    grid = (bh, s // block_q, s // block_k)
    out = pl.pallas_call(
        _flash_kernel_i8pv,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, j, kb: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, j, kb: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d_pad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qi, ki, vi, sc, svr)
    return out[:, :, :d]


def _reference_attention_qkpv_int8(q, k, v):
    """einsum mirror of _flash_bhsd_i8pv at block_k == S granularity:
    int8 logits, p quantized against the per-row softmax max (rowmax = 1
    when the whole row is one block), int8 PV with the per-slab V scale."""
    b, s, h, d = q.shape
    to_slab = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    qi, sq = _quantize_rows(to_slab(q))
    ki, sk = _quantize_rows(to_slab(k))
    vi, sv = _quantize_rows(to_slab(v))
    sc = (sq * sk * d ** -0.5).reshape(b * h, 1, 1)
    logits = (
        jax.lax.dot_general(
            qi,
            ki,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        * sc
    )  # (BH, S, S)
    p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
    pv = jax.lax.dot_general(
        p_i8,
        vi,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    l = jnp.sum(p_i8.astype(jnp.float32), axis=-1, keepdims=True)
    out = (pv / l) * sv[:, :, None]
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3).astype(v.dtype)


def _reference_attention_qk_int8(q, k, v):
    """einsum path with int8 QK at the same per-(b,h) granularity as the
    kernel — the CPU-testable mirror of _flash_bhsd_i8."""
    b, s, h, d = q.shape
    to_slab = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    qi, sq = _quantize_rows(to_slab(q))
    ki, sk = _quantize_rows(to_slab(k))
    sc = (sq * sk * d ** -0.5).reshape(b, h, 1, 1)
    logits = (
        jax.lax.dot_general(
            qi,
            ki,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        .astype(jnp.float32)
        .reshape(b, h, s, s)
        * sc
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _qk_int8_attention(q, k, v, block_q, block_k):
    b, s, h, d = q.shape
    bq = min(block_q, s)
    bk = min(block_k, s)
    use_kernel = (
        jax.default_backend() == "tpu"
        and s % bq == 0
        and s % bk == 0
        and s >= 512
    )
    if not use_kernel:
        return _reference_attention_qk_int8(q, k, v)
    to_slab = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    out = _flash_bhsd_i8(to_slab(q), to_slab(k), to_slab(v), bq, bk)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _qk_int8_fwd(q, k, v, block_q, block_k):
    return _qk_int8_attention(q, k, v, block_q, block_k), None


def _qk_int8_bwd(block_q, block_k, res, g):
    raise NotImplementedError(
        "qk_int8 attention is a serving-only op: differentiating through "
        "the int8 quantizer would yield silent zero gradients. Train with "
        "qk_int8=False and quantize for sampling."
    )


_qk_int8_attention.defvjp(_qk_int8_fwd, _qk_int8_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _qkpv_int8_attention(q, k, v, block_q, block_k):
    b, s, h, d = q.shape
    bq = min(block_q, s)
    bk = min(block_k, s)
    use_kernel = (
        jax.default_backend() == "tpu"
        and s % bq == 0
        and s % bk == 0
        and s >= 512
    )
    if not use_kernel:
        return _reference_attention_qkpv_int8(q, k, v)
    to_slab = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    out = _flash_bhsd_i8pv(to_slab(q), to_slab(k), to_slab(v), bq, bk)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _qkpv_int8_fwd(q, k, v, block_q, block_k):
    return _qkpv_int8_attention(q, k, v, block_q, block_k), None


_qkpv_int8_attention.defvjp(_qkpv_int8_fwd, _qk_int8_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_slab(q, k, v, block_q: int, block_k: int):
    out, _lse = _flash_bhsd(q, k, v, block_q, block_k)
    return out


def _flash_slab_fwd(q, k, v, block_q: int, block_k: int):
    out, lse = _flash_bhsd(q, k, v, block_q, block_k)
    # keep only lane 0 as the residual: holding the lane-replicated
    # (BH, S, 128) f32 array from forward to backward costs 128x the
    # memory (268 MB per attention layer at B32/H1/S4096)
    return out, (q, k, v, out, lse[:, :, 0])


def _flash_slab_bwd(block_q: int, block_k: int, res, g):
    q, k, v, o, lse_rows = res
    # transient lane replication for the kernels' (1, BQ, 128) blocks
    lse = jnp.broadcast_to(lse_rows[..., None], (*lse_rows.shape, 128))
    # Fused Pallas backward (dKV + dQ kernels). Round 1 used a jnp scan
    # that materialized (BH, BQ, S) f32 logits per chunk in HBM — measured
    # 142 ms fwd+bwd at (B32, S4096, H4, D32) vs ~19 ms forward alone;
    # the kernels keep everything in VMEM.
    return _flash_bwd_bhsd(q, k, v, o, lse, g, block_q, block_k)


_flash_slab.defvjp(_flash_slab_fwd, _flash_slab_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    qk_int8: bool = False,
    pv_int8: bool = False,
) -> jnp.ndarray:
    """Self-attention with (B, S, H, D) layout, fused on TPU.

    Differentiable: the forward is the Pallas kernel (emitting the per-row
    logsumexp); the backward is the Pallas dQ/dKV kernel pair recomputing
    softmax from the LSE (no O(S^2) residuals are saved). Falls back to
    the einsum path when the sequence doesn't tile evenly (image token
    counts are powers of two in this workload, so 512+ maps always take
    the fused path).

    ``qk_int8=True`` selects the serving-only dynamic-int8 QK kernel
    (2x MXU rate on the logit matmul; raises on differentiation).
    ``pv_int8=True`` additionally quantizes the PV matmul (implies
    qk_int8) so both MXU contractions run at the int8 rate.
    """
    b, s, h, d = q.shape
    if pv_int8:
        return _qkpv_int8_attention(q, k, v, block_q, block_k)
    if qk_int8:
        return _qk_int8_attention(q, k, v, block_q, block_k)
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    if s % block_q != 0 or s % block_k != 0 or s < 512:
        return _reference_attention(q, k, v)
    # (B, S, H, D) -> (B*H, S, D)
    to_slab = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    out = _flash_slab(to_slab(q), to_slab(k), to_slab(v), block_q, block_k)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


__all__ = ["flash_attention"]
