"""TPU probe for the Pallas im2col conv (ops/im2col_conv.py).

1. numerics vs the XLA conv at the flagship hot shapes
2. chained in-jit timing: XLA conv vs im2col kernel, standalone
3. in-context: flagship 128px forward + train step with the narrow-conv
   swap on/off (the packed-conv lesson: isolation wins can be in-context
   losses; measure the real thing)

Run (TPU, alone):  python scripts/probe_im2col_r2.py [--skip-model]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from diffusionmodelscustom_tpu.ops.im2col_conv import (
    _reference_conv,
    im2col_conv3x3,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[:8]))


def chain_time(fn, x, n=20):
    """Chained in-jit iterations; min-of-3 with varied inputs."""

    @jax.jit
    def chained(x0):
        def body(c, _):
            y = fn(c)
            # feed a scalar of y back so iterations are dependent
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-model", action="store_true")
    ap.add_argument("--tile", type=int, default=8)
    args = ap.parse_args()
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    # hot conv shapes in the flagship at 128px (B=32):
    shapes = [
        (32, 128, 128, 64, 64),    # level-0 DoubleConv body
        (32, 128, 128, 128, 64),   # up-path concat -> narrow
        (32, 128, 128, 4, 64),     # stem (tiny Cin)
        (32, 64, 64, 128, 128),    # level-1 (XLA already ~110 TF/s)
    ]
    for b, h, w, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        k = (
            jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.bfloat16)
            * 0.05
        )

        ref = jax.jit(lambda xx: _reference_conv(xx, k))
        ker = jax.jit(lambda xx: im2col_conv3x3(xx, k, tile_h=args.tile))
        o_r = np.asarray(jax.device_get(ref(x)), np.float32)
        o_k = np.asarray(jax.device_get(ker(x)), np.float32)
        rel = np.max(np.abs(o_r - o_k)) / (np.max(np.abs(o_r)) + 1e-9)

        ms_r = chain_time(lambda xx: _reference_conv(xx, k), x)
        ms_k = chain_time(lambda xx: im2col_conv3x3(xx, k, tile_h=args.tile), x)
        fl = 2 * b * h * w * 9 * cin * cout
        log(
            f"({b},{h},{w},{cin}->{cout}): rel={rel:.4f}  "
            f"xla {ms_r:6.3f} ms ({fl/ms_r/1e9:6.1f} TF/s)  "
            f"im2col {ms_k:6.3f} ms ({fl/ms_k/1e9:6.1f} TF/s)  "
            f"speedup {ms_r/ms_k:.2f}x"
        )

    if args.skip_model:
        return

    # ---- in-context: flagship forward with/without the swap ------------
    from diffusionmodelscustom_tpu.models import ConditionalUNet

    def build(narrow):
        return ConditionalUNet(
            out_channels=1, base_channels=64, time_dim=256, n_heads=4,
            num_classes=4, cond_img_channels=1, cond_on_lsm=True,
            cond_on_topo=True, attention_levels=(1, 2, 3),
            attention_levels_up=(2, 1), dtype=jnp.bfloat16,
            im2col_narrow=narrow,
        )

    b = 32
    x = jnp.asarray(rng.standard_normal((b, 128, 128, 1)), jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b,), jnp.int32)
    ci = jnp.asarray(rng.standard_normal((b, 128, 128, 1)), jnp.float32)
    lsm = jnp.zeros((b, 128, 128, 1), jnp.float32)
    topo = jnp.zeros((b, 128, 128, 1), jnp.float32)

    base = build(False)
    params = base.init(jax.random.key(0), x, t, y, ci, lsm, topo)

    for narrow in (False, True):
        model = build(narrow)
        fwd = lambda xx: model.apply(params, xx, t, y, ci, lsm, topo)
        ms = chain_time(fwd, x, n=10)
        log(f"flagship fwd 128px b32 im2col_narrow={narrow}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
