"""Round-3 in-context ablation of the flagship SAMPLING forward.

Round-2's standalone numbers mislead (XLA fuses differently in the full
graph): here each variant swaps ONE component out of the full 128px
batch-32 forward and measures the end-to-end delta. The deltas bound what
a fused kernel for that component could possibly win.

Run on the real TPU chip (one process at a time):
    nohup python scripts/ablate_r3.py > /tmp/ablate_r3_ctx.log 2>&1 &
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


def time_fwd(name, model, n=10):
    from __graft_entry__ import _example_batch

    batch, size = 32, 128
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

    fn = jax.jit(lambda x: b["img"] + 1e-6 * fwd(x).astype(b["img"].dtype))
    x = b["img"]
    t0 = time.perf_counter()
    np.asarray(jax.device_get(fn(x).reshape(-1)[:8]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    np.asarray(jax.device_get(x.reshape(-1)[:8]))
    dt = (time.perf_counter() - t0 - _RTT) / n
    print(f"{name:48s} {dt * 1e3:8.3f} ms  (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    measure_rtt()

    from __graft_entry__ import _flagship
    from diffusionmodelscustom_tpu.models import unet as unet_mod

    base = time_fwd("baseline flagship fwd", _flagship())

    # -- no attention at all -------------------------------------------------
    m = _flagship()
    m = m.clone(attention_levels=(), attention_levels_up=())
    time_fwd("no attention", m)

    # -- GroupNorm -> identity ----------------------------------------------
    orig_norm = unet_mod.DoubleConv._norm
    try:
        unet_mod.DoubleConv._norm = lambda self, ch, name: (lambda h: h)
        time_fwd("GN(1) -> identity (all DoubleConvs)", _flagship())
    finally:
        unet_mod.DoubleConv._norm = orig_norm

    # -- GN with 32 groups (channel-blocked stats, cheaper reduce) -----------
    try:
        from flax import linen as nn

        unet_mod.DoubleConv._norm = lambda self, ch, name: nn.GroupNorm(
            num_groups=min(32, ch), dtype=self.dtype, name=name
        )
        time_fwd("GN(32) instead of GN(1)", _flagship())
    finally:
        unet_mod.DoubleConv._norm = orig_norm

    # -- bilinear up -> nearest ----------------------------------------------
    from diffusionmodelscustom_tpu.ops import resize as resize_mod

    orig_up = resize_mod.upsample_2x

    def nearest_up(x, method="bilinear"):
        return orig_up(x, method="nearest")

    try:
        unet_mod.upsample_2x = nearest_up
        time_fwd("bilinear upsample -> nearest", _flagship())
    finally:
        unet_mod.upsample_2x = orig_up

    # -- f32 everywhere (dtype sanity: how much does bf16 buy) ---------------
    time_fwd("f32 compute", _flagship().clone(dtype=jnp.float32))


if __name__ == "__main__":
    main()
