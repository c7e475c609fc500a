"""Input-pipeline probes for the store-backed train throughput gap
(round-2 VERDICT item 5): is it H2D bandwidth over the axon tunnel, and
does device_put overlap with device compute?

Measured questions:
1. raw H2D bandwidth at batch-sized transfers (1/5/10.5/21 MB)
2. does a background-thread device_put overlap with a running compute
   chain, or serialize with it?
3. per-dtype: f32 vs bf16 transfer of the same logical batch

Run (TPU, alone):  python scripts/probe_input_r2.py
"""

import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[:8]))


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    # --- 1. raw H2D bandwidth ------------------------------------------
    for mb in (1, 5, 10.5, 21):
        n = int(mb * 1e6 / 4)
        best = float("inf")
        for rep in range(4):
            host = rng.standard_normal(n).astype(np.float32)
            t0 = time.perf_counter()
            d = jax.device_put(host)
            sync(d)
            dt = time.perf_counter() - t0
            if rep:  # skip first (fresh-buffer stall)
                best = min(best, dt)
        log(f"H2D {mb:5.1f} MB f32: {best * 1e3:7.1f} ms  "
            f"({mb / best:6.1f} MB/s)")

    # bf16 of the same logical element count (half the bytes)
    n = int(10.5e6 / 4)
    best = float("inf")
    for rep in range(4):
        host = rng.standard_normal(n).astype(ml_dtypes.bfloat16)
        t0 = time.perf_counter()
        sync(jax.device_put(host))
        dt = time.perf_counter() - t0
        if rep:
            best = min(best, dt)
    log(f"H2D  10.5M elems bf16 (5.25 MB): {best * 1e3:7.1f} ms "
        f"({5.25 / best:6.1f} MB/s)")

    # --- 1b. one packed put vs 6 field puts (fixed-cost amortization) ---
    fields = [rng.standard_normal(int(1.75e6 / 4)).astype(np.float32)
              for _ in range(6)]
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        ds = [jax.device_put(f * (1 + 1e-5 * rep)) for f in fields]
        for d in ds:
            sync(d)
        best = min(best, time.perf_counter() - t0)
    log(f"6 x 1.75 MB separate puts: {best * 1e3:7.1f} ms")
    packed = np.concatenate(fields)
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        sync(jax.device_put(packed * (1 + 1e-5 * rep)))
        best = min(best, time.perf_counter() - t0)
    log(f"1 x 10.5 MB packed put:    {best * 1e3:7.1f} ms")

    # --- 2. overlap: compute chain + background device_put -------------
    m = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)

    S = 40

    @jax.jit
    def burn(x):
        def body(c, _):
            return jnp.tanh(c @ m), ()

        c, _ = jax.lax.scan(body, x, None, length=S)
        return c

    x0 = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    sync(burn(x0))  # compile

    t0 = time.perf_counter()
    sync(burn(x0 * 1.0001))
    t_compute = time.perf_counter() - t0
    log(f"compute-only ({S} chained 4096^3 matmuls): {t_compute * 1e3:.0f} ms")

    # transfer-only time for K batches
    K = 6
    hosts = [rng.standard_normal(int(10.5e6 / 4)).astype(np.float32)
             for _ in range(K)]
    t0 = time.perf_counter()
    devs = [jax.device_put(h) for h in hosts]
    for d in devs:
        sync(d)
    t_xfer = time.perf_counter() - t0
    log(f"transfer-only ({K} x 10.5 MB): {t_xfer * 1e3:.0f} ms")

    # overlapped: start compute, then feed transfers from a thread
    results = []

    def producer():
        t0 = time.perf_counter()
        ds = [jax.device_put(h) for h in hosts]
        for d in ds:
            sync(d)
        results.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    fut = burn(x0 * 1.0002)
    th = threading.Thread(target=producer)
    th.start()
    sync(fut)
    t_compute_in_overlap = time.perf_counter() - t0
    th.join()
    t_total = time.perf_counter() - t0
    log(f"overlapped: total {t_total * 1e3:.0f} ms "
        f"(compute arm {t_compute_in_overlap * 1e3:.0f} ms, "
        f"transfer arm {results[0] * 1e3:.0f} ms)")
    ideal = max(t_compute, t_xfer)
    serial = t_compute + t_xfer
    log(f"ideal overlap {ideal * 1e3:.0f} ms vs serial {serial * 1e3:.0f} ms "
        f"-> measured {t_total * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
