"""Round-3 attention sweep: per-sequence-length block-size tuning.

The round-2 sweep fixed (block_q, block_k) = (512, 1024) globally, tuned at
S=4096. The round-3 ablation shows the S=1024 layers (two of the flagship's
five attention sites) run at ~17 TF/s — overhead-bound, not FLOP-bound.
This sweep times the flash kernel per (S, block_q, block_k) against the
materialized jnp path to pick per-S defaults.

Run on the real TPU chip (ONE process at a time):
    python scripts/sweep_attn_r3.py > /tmp/sweep_attn.log 2>&1
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

_RTT = None


def measure_rtt():
    global _RTT
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(jax.device_get(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(x))
        ts.append(time.perf_counter() - t0)
    _RTT = min(ts)
    print(f"host-fetch RTT: {_RTT * 1e3:.2f} ms", flush=True)


def timeit(name, fn, x0, n=20, flops=None):
    fn_j = jax.jit(lambda x: x0 + 1e-6 * fn(x).astype(x0.dtype))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(fn_j(x0).reshape(-1)[:8]))
    compile_s = time.perf_counter() - t0
    x = x0
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn_j(x)
    np.asarray(jax.device_get(x.reshape(-1)[:8]))
    dt = (time.perf_counter() - t0 - _RTT) / n
    tf = f" {flops / dt / 1e12:7.2f} TF/s" if flops else ""
    print(f"{name:48s} {dt * 1e3:9.3f} ms{tf}  (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    from diffusionmodelscustom_tpu.ops.flash_attention import (
        _reference_attention,
        flash_attention,
    )

    rng = jax.random.key(0)
    # flagship attention sites at 128px, head_dim-128 routing:
    #   down1/up2: S=4096 H1 C=128; down2/up1: S=1024 H2 C=256;
    #   down3:     S=256  H2 C=256 (jnp path today)
    cases = [
        ("S4096 H1 D128", (32, 4096, 1, 128)),
        ("S4096 H1 D64 ", (32, 4096, 1, 64)),  # up2 site: C=64 map
        ("S1024 H2 D128", (32, 1024, 2, 128)),
        ("S256  H2 D128", (32, 256, 2, 128)),
    ]
    import os
    only = os.environ.get("SWEEP_ONLY")
    if only:
        cases = [c for c in cases if only in c[0]]
    for name, (b, s, h, d) in cases:
        q = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        flops_fwd = 2 * 2 * b * h * s * s * d

        timeit(f"jnp ref fwd      {name}",
               lambda q: _reference_attention(q, q, q), q, flops=flops_fwd)
        timeit(
            f"jnp ref fwd+bwd  {name}",
            jax.grad(
                lambda q: _reference_attention(q, q, q)
                .astype(jnp.float32).sum()
            ),
            q, flops=3 * flops_fwd,
        )
        if s < 512:
            continue  # flash_attention routes S<512 to the jnp path
        for bq in (256, 512, 1024):
            for bk in (256, 512, 1024, 2048):
                if bq > s or bk > s:
                    continue
                try:
                    timeit(
                        f"flash {bq:4d}/{bk:4d}  fwd      {name}",
                        lambda q, bq=bq, bk=bk: flash_attention(q, q, q, bq, bk),
                        q, flops=flops_fwd,
                    )
                    timeit(
                        f"flash {bq:4d}/{bk:4d}  fwd+bwd  {name}",
                        jax.grad(
                            lambda q, bq=bq, bk=bk: flash_attention(q, q, q, bq, bk)
                            .astype(jnp.float32).sum()
                        ),
                        q, flops=3 * flops_fwd,
                    )
                except Exception as e:
                    print(f"flash {bq:4d}/{bk:4d}  {name}: FAILED "
                          f"({type(e).__name__})", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    measure_rtt()
    main()
