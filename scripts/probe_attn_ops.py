"""Op-level bisection of the TransformerBlock+context 59 ms stall.

probe_cascade_attn found: TransformerBlock with context tokens = 59.3 ms
CONSTANT (independent of feature-map shape); without context 3.6 ms; the
same block preceded by a ResnetBlock = 3.7 ms. This rebuilds the block's
internals op by op in plain jnp to find which op (or op pairing)
triggers the stall.

Run (TPU, alone):  python scripts/probe_attn_ops.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, S, C, H, D = 16, 1024, 256, 4, 64
L = 12  # context tokens
CD = 512  # context dim


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[:8]))


def chain_time(fn, x, n=8, tag=""):
    @jax.jit
    def chained(x0):
        def body(c, _):
            y = fn(c)
            return c * 0.999 + jnp.mean(y).astype(c.dtype) * 1e-6, ()

        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    sync(chained(x))
    t0 = time.perf_counter()
    sync(chained(x * 1.0001))
    ms = (time.perf_counter() - t0) / n * 1e3
    log(f"{tag:44s}: {ms:7.2f} ms")
    return ms


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, C)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, L, CD)), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * H * D)) * 0.02, jnp.bfloat16)
    wctx = jnp.asarray(rng.standard_normal((CD, 2 * D)) * 0.02, jnp.bfloat16)
    wout = jnp.asarray(rng.standard_normal((H * D, C)) * 0.02, jnp.bfloat16)

    def einsum_attn(q, k, v):
        scale = D**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, v)

    def qkv_of(xx):
        qkv = (xx.astype(jnp.bfloat16) @ wqkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        r = lambda t: t.reshape(B, S, H, D)
        return r(q), r(k), r(v)

    # 1. self-attn only (einsum path, no context)
    def f1(xx):
        q, k, v = qkv_of(xx)
        o = einsum_attn(q, k, v)
        return (o.reshape(B, S, H * D) @ wout).astype(jnp.float32)

    chain_time(f1, x, tag="einsum self-attn S1024 (no ctx)")

    # 2. + context kv concat (the TransformerBlock pathway)
    def f2(xx):
        q, k, v = qkv_of(xx)
        ckv = ctx.astype(jnp.bfloat16) @ wctx
        ck, cv = jnp.split(ckv, 2, axis=-1)
        ck = jnp.broadcast_to(ck[:, :, None, :], (B, L, H, D))
        cv = jnp.broadcast_to(cv[:, :, None, :], (B, L, H, D))
        k = jnp.concatenate([ck, k], axis=1)
        v = jnp.concatenate([cv, v], axis=1)
        o = einsum_attn(q, k, v)
        return (o.reshape(B, S, H * D) @ wout).astype(jnp.float32)

    chain_time(f2, x, tag="einsum attn + ctx kv concat (S_kv=1036)")

    # 3. concat but from x-derived tokens (same kv length, no ctx input)
    def f3(xx):
        q, k, v = qkv_of(xx)
        k = jnp.concatenate([k[:, :L], k], axis=1)
        v = jnp.concatenate([v[:, :L], v], axis=1)
        o = einsum_attn(q, k, v)
        return (o.reshape(B, S, H * D) @ wout).astype(jnp.float32)

    chain_time(f3, x, tag="einsum attn + self kv concat (S_kv=1036)")

    # 4. ctx kv WITHOUT broadcast_to (tile via repeat)
    def f4(xx):
        q, k, v = qkv_of(xx)
        ckv = ctx.astype(jnp.bfloat16) @ wctx
        ck, cv = jnp.split(ckv, 2, axis=-1)
        ck = jnp.repeat(ck[:, :, None, :], H, axis=2)
        cv = jnp.repeat(cv[:, :, None, :], H, axis=2)
        k = jnp.concatenate([ck, k], axis=1)
        v = jnp.concatenate([cv, v], axis=1)
        o = einsum_attn(q, k, v)
        return (o.reshape(B, S, H * D) @ wout).astype(jnp.float32)

    chain_time(f4, x, tag="ctx kv via repeat (no broadcast_to)")

    # 5. ctx as part of the chain carrier (not a closure constant)
    def f5(pair):
        xx, cc = pair
        q, k, v = qkv_of(xx)
        ckv = cc.astype(jnp.bfloat16) @ wctx
        ck, cv = jnp.split(ckv, 2, axis=-1)
        ck = jnp.broadcast_to(ck[:, :, None, :], (B, L, H, D))
        cv = jnp.broadcast_to(cv[:, :, None, :], (B, L, H, D))
        k2 = jnp.concatenate([ck, k], axis=1)
        v2 = jnp.concatenate([cv, v], axis=1)
        o = einsum_attn(q, k2, v2)
        return (o.reshape(B, S, H * D) @ wout).astype(jnp.float32)

    @jax.jit
    def chained5(x0, c0):
        def body(carry, _):
            xx, cc = carry
            y = f5((xx, cc))
            return (xx * 0.999 + jnp.mean(y).astype(xx.dtype) * 1e-6, cc), ()

        (xx, cc), _ = jax.lax.scan(body, (x0, c0), None, length=8)
        return xx

    sync(chained5(x, ctx))
    t0 = time.perf_counter()
    sync(chained5(x * 1.0001, ctx))
    log(f"{'ctx as jit argument':44s}: {(time.perf_counter()-t0)/8*1e3:7.2f} ms")

    # 6. softmax over 1036 (non-128-multiple) alone
    def f6(xx):
        q, k, v = qkv_of(xx)
        pad = jnp.zeros((B, L, H, D), jnp.bfloat16)
        k = jnp.concatenate([pad, k], axis=1)
        v = jnp.concatenate([pad, v], axis=1)
        o = einsum_attn(q, k, v)
        return (o.reshape(B, S, H * D) @ wout).astype(jnp.float32)

    chain_time(f6, x, tag="zero-pad kv concat (S_kv=1036)")

    # 7. kv padded to 1152 (9x128) instead of 1036
    def f7(xx):
        q, k, v = qkv_of(xx)
        ckv = ctx.astype(jnp.bfloat16) @ wctx
        ck, cv = jnp.split(ckv, 2, axis=-1)
        npad = 128
        ck = jnp.broadcast_to(ck[:, :, None, :], (B, L, H, D))
        cv = jnp.broadcast_to(cv[:, :, None, :], (B, L, H, D))
        zk = jnp.full((B, npad - L, H, D), -0.0, jnp.bfloat16)
        k = jnp.concatenate([ck, zk, k], axis=1)
        v = jnp.concatenate([cv, zk, v], axis=1)
        # mask the pad keys out via -inf on their logits
        scale = D**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        neg = jnp.full((npad - L,), -1e9, jnp.float32)
        bias = jnp.concatenate(
            [jnp.zeros((L,)), neg, jnp.zeros((S,))]
        )
        logits = logits + bias[None, None, None, :]
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        return (o.reshape(B, S, H * D) @ wout).astype(jnp.float32)

    chain_time(f7, x, tag="ctx kv concat padded to 128-multiple")


if __name__ == "__main__":
    main()
