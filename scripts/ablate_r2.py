"""Round-2 MFU ablation: time the suspected train-step sinks in isolation.

Run on the real TPU chip (one process at a time):
    nohup python scripts/ablate_r2.py > /tmp/ablate_r2.log 2>&1 &

MEASUREMENT NOTE (important): on the axon remote backend,
``jax.block_until_ready`` returns at dispatch time — it does NOT
synchronize with device execution. The only true sync is a host fetch
(``jax.device_get``), which carries a ~28 ms tunnel RTT. Every timing here
therefore (a) chains each iteration's input on the previous output so
nothing can be elided or overlapped away, and (b) fetches a small slice
once at the end, subtracting the separately-measured RTT.
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
    """Time a shape-preserving fn by chaining: x <- x0 + eps * fn(x)."""
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
    print(f"{name:55s} {dt * 1e3:9.3f} ms{tf}  (compile {compile_s:.1f}s)", flush=True)
    return dt


def bench_matmul_ceiling():
    x = jax.random.normal(jax.random.key(0), (4096, 4096), jnp.bfloat16) * 0.01

    def dep_matmul(x):
        y = x
        for _ in range(8):
            y = jnp.dot(y, y, preferred_element_type=jnp.bfloat16)
        return y

    timeit("matmul ceiling 8x dependent 4096^3 bf16", dep_matmul, x,
           flops=8 * 2 * 4096**3)


def bench_attention():
    from diffusionmodelscustom_tpu.ops.flash_attention import flash_attention

    rng = jax.random.key(0)
    shapes = [
        ("L1  B32 S4096 H4 D32 ", (32, 4096, 4, 32)),
        ("L1  B32 S4096 H1 D128", (32, 4096, 1, 128)),
        ("L2  B32 S1024 H4 D64 ", (32, 1024, 4, 64)),
        ("L2  B32 S1024 H2 D128", (32, 1024, 2, 128)),
    ]
    for name, (b, s, h, d) in shapes:
        q = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        flops_fwd = 2 * 2 * b * h * s * s * d

        timeit(f"attn flash fwd     {name}",
               lambda q: flash_attention(q, q, q), q, flops=flops_fwd)
        timeit(f"attn flash fwd+bwd {name}",
               jax.grad(lambda q: flash_attention(q, q, q).astype(jnp.float32).sum()),
               q, flops=3 * flops_fwd)


def bench_groupnorm():
    from flax import linen as nn

    rng = jax.random.key(0)
    for name, shape in [
        ("GN(1) 128^2x64 ", (32, 128, 128, 64)),
        ("GN(1) 64^2x128 ", (32, 64, 64, 128)),
    ]:
        x = jax.random.normal(rng, shape, jnp.bfloat16)
        gn = nn.GroupNorm(num_groups=1, dtype=jnp.bfloat16)
        params = gn.init(rng, x)
        nbytes = 2 * x.size * 2

        timeit(f"{name} fwd     ({nbytes / 1e6:.0f}MB traffic)",
               lambda x: gn.apply(params, x), x)
        timeit(f"{name} fwd+bwd",
               jax.grad(lambda x: gn.apply(params, x).astype(jnp.float32).sum()), x)


def bench_doubleconv():
    from diffusionmodelscustom_tpu.models.unet import DoubleConv

    rng = jax.random.key(0)
    cases = [
        ("DC 128^2 c64 ", (32, 128, 128, 64), 64),
        ("DC 64^2  c128", (32, 64, 64, 128), 128),
        ("DC 32^2  c256", (32, 32, 32, 256), 256),
    ]
    for name, shape, ch in cases:
        x = jax.random.normal(rng, shape, jnp.bfloat16)
        m = DoubleConv(ch, dtype=jnp.bfloat16)
        params = m.init(rng, x)
        b, hh, ww, c = shape
        flops = 2 * 2 * b * hh * ww * 9 * c * ch

        timeit(f"{name} fwd    ", lambda x: m.apply(params, x), x, flops=flops)
        timeit(f"{name} fwd+bwd",
               jax.grad(lambda x: m.apply(params, x).astype(jnp.float32).sum()),
               x, flops=3 * flops)


def bench_full_model():
    from __graft_entry__ import _example_batch, _flagship
    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.train import Trainer, TrainerConfig

    batch, size = 32, 128
    model = _flagship()
    b = _example_batch(jax.random.key(0), batch, size)
    t = jnp.full((batch,), 500, jnp.int32)
    variables = model.init(
        jax.random.key(0), b["img"], t, b["classifier"], b["img_cond"],
        b["lsm"], b["topo"],
    )

    def fwd(x):
        return model.apply(
            {"params": variables["params"]}, x, t, b["classifier"],
            b["img_cond"], b["lsm"], b["topo"],
        )

    timeit("flagship fwd only (b32 128px)", fwd, b["img"].astype(jnp.float32), n=10)

    diffusion = GaussianDiffusion.create(n_timesteps=1000)
    trainer = Trainer(
        model, diffusion,
        TrainerConfig(loss="sdfweighted", cfg_dropout_prob=0.1, num_classes=4),
    )
    state = trainer.init_state(jax.random.key(0), b)
    step = trainer._train_step

    t0 = time.perf_counter()
    state, m = step(state, b, jax.random.key(1))
    np.asarray(jax.device_get(m["loss"]))
    print(f"train step compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, b, jax.random.fold_in(jax.random.key(2), i))
    np.asarray(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0 - _RTT) / n
    print(
        f"flagship train step: {dt * 1e3:.1f} ms  ({1 / dt:.2f} steps/s)",
        flush=True,
    )


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    measure_rtt()
    bench_matmul_ceiling()
    bench_attention()
    bench_groupnorm()
    bench_doubleconv()
    bench_full_model()
