"""TPU check for the int8-QK flash kernel: numerics vs the exact einsum
path + forward timing at the flagship attention shapes.

Run (TPU, alone):  python scripts/check_qk_int8.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from diffusionmodelscustom_tpu.ops.attention import attention_core


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[:8]))


def chain_time(fn, x, n=10):
    @jax.jit
    def chained(x0):
        def body(c, _):
            y = fn(c)
            return c * 0.999 + jnp.mean(y).astype(c.dtype) * 1e-6, ()

        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    sync(chained(x))
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        sync(chained(x * (1.0 + 1e-4 * (rep + 1))))
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    # flagship attention shapes: (B, S, H, D) with D=128 head capping
    for b, s, h, d in ((32, 4096, 1, 128), (32, 1024, 2, 128), (32, 256, 2, 128)):
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)

        exact = jax.jit(lambda qq: attention_core(qq, k, v, use_flash=False))
        i8 = jax.jit(lambda qq: attention_core(qq, k, v, qk_int8=True))
        i8pv = jax.jit(lambda qq: attention_core(qq, k, v, pv_int8=True))

        o_e = np.asarray(jax.device_get(exact(q)), np.float32)
        o_i = np.asarray(jax.device_get(i8(q)), np.float32)
        o_p = np.asarray(jax.device_get(i8pv(q)), np.float32)
        me = np.max(np.abs(o_e)) + 1e-9
        rel = np.max(np.abs(o_e - o_i)) / me
        rel_pv = np.max(np.abs(o_e - o_p)) / me
        ms_f = chain_time(lambda qq: attention_core(qq, k, v, use_flash=True), q)
        ms_i = chain_time(lambda qq: attention_core(qq, k, v, qk_int8=True), q)
        ms_p = chain_time(lambda qq: attention_core(qq, k, v, pv_int8=True), q)
        flops = 4 * b * h * s * s * d
        log(
            f"B{b} S{s} H{h} D{d}: qk_rel={rel:.4f} pv_rel={rel_pv:.4f}  "
            f"flash {ms_f:6.2f} ms ({flops/ms_f/1e9:5.1f} TF/s)  "
            f"qk8 {ms_i:6.2f} ms ({flops/ms_i/1e9:5.1f} TF/s)  "
            f"qkpv8 {ms_p:6.2f} ms ({flops/ms_p/1e9:5.1f} TF/s)  "
            f"qkpv vs flash {ms_f/ms_p:.2f}x"
        )


if __name__ == "__main__":
    main()
