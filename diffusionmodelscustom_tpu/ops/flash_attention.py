"""Fused flash-attention Pallas kernel for TPU.

Replaces the reference's ``nn.MultiheadAttention`` materialized-logits path
(modules_DANRA_conditional.py:89-105 — the #1 training hotspot per
SURVEY.md section 3) with an online-softmax kernel: the (S x S) logit
matrix never exists, and K/V stream through VMEM in blocks (grid dimension
with carried accumulators), so VMEM use is O(block) regardless of sequence
length — full-domain maps (128x128 -> S=16384) fit fine.

Shapes in this workload are image-token attention: S = H*W up to ~16k,
head_dim typically 16..128. Head dims are zero-padded to the 128-lane MXU
width in the wrapper (zero padding is exact: it adds nothing to q.k'
logits and produces output columns that are sliced away). Maps smaller
than one q-block fall back to a jnp einsum — for S <= 256 XLA's fusion is
already at speed of light and a grid launch would only add overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block sizes aligned to the 8x128 f32 / 16x128 bf16 VMEM tiles.
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
_NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, sm_scale: float
):
    """Grid (bh, q_blocks, k_blocks); the k dimension is sequential
    ("arbitrary") and carries the online-softmax state in VMEM scratch."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * sm_scale  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (BK, D)
    v = v_ref[0].astype(jnp.float32)  # (BK, D)

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK)

    m_prev = m_scr[:]  # (BQ, 1)
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _flash_bhsd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int,
    block_k: int,
) -> jnp.ndarray:
    """Flash attention on (BH, S, D) slabs; S divisible by both block sizes."""
    bh, s, d = q.shape
    sm_scale = d ** -0.5  # scale by the *unpadded* head dim

    d_pad = max(128, ((d + 127) // 128) * 128)
    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, d_pad - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))

    grid = (bh, s // block_q, s // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    return out[:, :, :d]


def _reference_attention(q, k, v):
    """jnp fallback; identical math, logits materialized (fine for tiny S)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _chunked_backward(q, k, v, g, block_q: int):
    """Recomputation backward on (BH, S, D) slabs, scanned over q blocks.

    Standard flash-attention gradient with per-chunk softmax recompute —
    peak memory is O(block_q * S) instead of O(S^2), and every contraction
    is an MXU matmul. All math in f32 for stable softmax gradients.
    """
    qf, kf, vf, gf = (x.astype(jnp.float32) for x in (q, k, v, g))
    scale = q.shape[-1] ** -0.5
    qs = qf * scale
    bh, s, d = qf.shape
    nq = s // block_q

    q_chunks = qs.reshape(bh, nq, block_q, d).transpose(1, 0, 2, 3)
    g_chunks = gf.reshape(bh, nq, block_q, d).transpose(1, 0, 2, 3)

    def body(carry, chunk):
        dk_acc, dv_acc = carry
        q_blk, g_blk = chunk  # (BH, BQ, D)
        logits = jnp.einsum("bqd,bkd->bqk", q_blk, kf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / l  # softmax weights (BH, BQ, S)
        dv_acc = dv_acc + jnp.einsum("bqk,bqd->bkd", p, g_blk)
        dp = jnp.einsum("bqd,bkd->bqk", g_blk, vf)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dq_blk = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
        dk_acc = dk_acc + jnp.einsum("bqk,bqd->bkd", ds, q_blk)
        return (dk_acc, dv_acc), dq_blk

    (dk, dv), dq_chunks = jax.lax.scan(
        body,
        (jnp.zeros_like(kf), jnp.zeros_like(vf)),
        (q_chunks, g_chunks),
    )
    dq = dq_chunks.transpose(1, 0, 2, 3).reshape(bh, s, d)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_slab(q, k, v, block_q: int, block_k: int):
    return _flash_bhsd(q, k, v, block_q, block_k)


def _flash_slab_fwd(q, k, v, block_q: int, block_k: int):
    out = _flash_bhsd(q, k, v, block_q, block_k)
    return out, (q, k, v)


def _flash_slab_bwd(block_q: int, block_k: int, res, g):
    q, k, v = res
    return _chunked_backward(q, k, v, g, block_q)


_flash_slab.defvjp(_flash_slab_fwd, _flash_slab_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Self-attention with (B, S, H, D) layout, fused on TPU.

    Differentiable: the forward is the Pallas kernel; the backward is a
    q-chunked recomputation pass (no O(S^2) residuals are saved). Falls
    back to the einsum path when the sequence doesn't tile evenly (image
    token counts are powers of two in this workload, so 512+ maps always
    take the fused path).
    """
    b, s, h, d = q.shape
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    if s % block_q != 0 or s % block_k != 0 or s < 512:
        return _reference_attention(q, k, v)
    # (B, S, H, D) -> (B*H, S, D)
    to_slab = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    out = _flash_slab(to_slab(q), to_slab(k), to_slab(v), block_q, block_k)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


__all__ = ["flash_attention"]
