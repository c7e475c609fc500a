"""Fused flash-attention Pallas kernel for TPU.

Replaces the reference's ``nn.MultiheadAttention`` materialized-logits path
(modules_DANRA_conditional.py:89-105 — the #1 training hotspot per
SURVEY.md section 3) with a VMEM-resident online-softmax kernel: the
(S x S) logit matrix never touches HBM.

Shapes in this workload are image-token attention: S = H*W <= 4096 for
128x128 inputs, head_dim typically 16..128. Head dims are zero-padded to
the 128-lane MXU width in the wrapper (zero padding is exact: it adds
nothing to q.k' logits and produces output columns that are sliced away).
Maps smaller than one q-block fall back to a jnp einsum — for S <= 256 the
XLA fusion is already at speed of light and a grid launch would only add
overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block sizes aligned to the 8x128 f32 / 16x128 bf16 VMEM tiles.
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float):
    """One (batch*head, q-block) program: online softmax over k blocks.

    q_ref: (1, BQ, D); k_ref/v_ref: (1, S, D); o_ref: (1, BQ, D).
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (BQ, D)
    seq_k = k_ref.shape[1]
    num_kb = seq_k // block_k

    block_q, d = q.shape
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q,
            k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (BQ, BK)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p,
            v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    _, l_fin, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l_fin).astype(o_ref.dtype)


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

    grid = (bh, s // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, d_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(q, k, v)
    return out[:, :, :d]


def _reference_attention(q, k, v):
    """jnp fallback; identical math, logits materialized (fine for tiny S)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Self-attention with (B, S, H, D) layout, fused on TPU.

    Falls back to the einsum path when the sequence doesn't tile evenly
    (image token counts are powers of two in this workload, so 512+ maps
    always take the fused path).
    """
    b, s, h, d = q.shape
    if s % block_q != 0 or s % block_k != 0 or s < 2 * block_q:
        return _reference_attention(q, k, v)
    # (B, S, H, D) -> (B*H, S, D)
    to_slab = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    out = _flash_bhsd(to_slab(q), to_slab(k), to_slab(v), block_q, block_k)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


__all__ = ["flash_attention"]
