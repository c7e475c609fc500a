"""Round-3 conv-side probe: where do the flagship's ~15 ms of non-attention
forward time go?

Measurement method: the remote backend has a fixed per-jit-call cost
(~1.5 ms — small-op microbenches bottom out there regardless of work), so
each timed function chains R=8 dependent copies of the op INSIDE one jit
call; per-op time = (call_time - fixed) / R with fixed estimated from a
no-op call. Shapes are the flagship ConditionalUNet's conv sites at
batch 32, 128px (models/unet.py):

    up1.res: 512ch @ 32x32    up2.res: 256ch @ 64x64
    up3.res: 128ch @ 128x128  inc/enc: 64ch @ 128x128
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

R = 8  # chained repeats inside one jit call


def timeit(name, make_fn, x0, flops_per_op=None, n=10):
    """make_fn(x) -> same-shape output; chained R times inside the call."""

    def chained(x):
        for _ in range(R):
            x = x0 + 1e-6 * make_fn(x).astype(x0.dtype)
        return x

    fn = jax.jit(chained)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(fn(x0).ravel()[:8]))
    compile_s = time.perf_counter() - t0
    x = x0
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    np.asarray(jax.device_get(x.ravel()[:8]))
    per_call = (time.perf_counter() - t0) / n
    per_op = per_call / R
    tf = (
        f" {flops_per_op / per_op / 1e12:7.2f} TF/s"
        if flops_per_op
        else ""
    )
    print(
        f"{name:42s} {per_op * 1e3:8.3f} ms/op{tf}  (compile {compile_s:.1f}s)",
        flush=True,
    )
    return per_op


def main():
    rng = jax.random.key(0)
    shapes = [
        ("512ch @32^2 ", (32, 32, 32, 512)),
        ("256ch @64^2 ", (32, 64, 64, 256)),
        ("128ch @128^2", (32, 128, 128, 128)),
        ("64ch  @128^2", (32, 128, 128, 64)),
    ]
    for name, shape in shapes:
        b, h, w, c = shape
        x = jax.random.normal(rng, shape, jnp.bfloat16)
        conv = nn.Conv(c, (3, 3), padding=1, use_bias=False, dtype=jnp.bfloat16)
        cp = conv.init(rng, x)
        gn = nn.GroupNorm(num_groups=1, dtype=jnp.bfloat16)
        gp = gn.init(rng, x)
        flops = 2 * b * h * w * 9 * c * c

        timeit(f"conv3x3           {name}", lambda y: conv.apply(cp, y), x,
               flops_per_op=flops)
        timeit(f"conv3x3+GN        {name}",
               lambda y: gn.apply(gp, conv.apply(cp, y)), x, flops_per_op=flops)
        timeit(f"conv3x3+GN+GELU   {name}",
               lambda y: nn.gelu(gn.apply(gp, conv.apply(cp, y))), x,
               flops_per_op=flops)
        timeit(f"GN alone          {name}", lambda y: gn.apply(gp, y), x)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    # fixed-cost floor: a single trivial op, chained — per-op time ~= 0
    z = jnp.zeros((8, 128), jnp.float32)
    timeit("noop (fixed-cost floor)", lambda y: y * 1.000001, z)
    main()
