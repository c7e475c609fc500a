"""Round-4 probe: the fused conv+GN(1)+GELU Pallas kernel (VERDICT item 3).

Measures ops/fused_conv_gn.py against the XLA composition it replaces at
the flagship's narrow conv sites (the 64ch maps running ~33 TF/s under
XLA, scripts/probe_conv_r3.py), then — if the isolated kernel wins — the
in-context flagship forward with the narrow DoubleConv halves routed
through the fused path.

Timing per CLAUDE.md: chained dependent ops inside one jit call, single
fetch, min-of-3 with varied inputs after a warm-up (the remote runtime
stalls ~55-70 ms on the first timed execution of a fresh pair).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/artifacts/jax_cache"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from diffusionmodelscustom_tpu.ops.fused_conv_gn import fused_conv_gn_gelu

R = 8  # chained repeats inside one jit call


def chain_time(name, make_fn, x0, flops_per_op=None, n=6):
    """min-of-3 groups of n chained calls, varied inputs, one fetch each."""

    def chained(x):
        for _ in range(R):
            x = x0 + 1e-6 * make_fn(x).astype(x0.dtype)
        return x

    fn = jax.jit(chained)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(fn(x0).ravel()[:8]))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for rep in range(3):
        x = x0 + 0.001 * rep
        np.asarray(jax.device_get(fn(x).ravel()[:8]))  # warm this buffer
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        np.asarray(jax.device_get(x.ravel()[:8]))
        best = min(best, (time.perf_counter() - t0) / n)
    per_op = best / R
    tf = f" {flops_per_op / per_op / 1e12:7.2f} TF/s" if flops_per_op else ""
    print(f"{name:44s} {per_op * 1e3:8.3f} ms/op{tf}"
          f"  (compile {compile_s:.1f}s)", flush=True)
    return per_op


def probe_isolated():
    rng = jax.random.key(0)
    sites = [
        ("64->64 @128^2", (32, 128, 128, 64), 64, False),
        ("64->64 @128^2 +res", (32, 128, 128, 64), 64, True),
        ("64->64 @64^2", (32, 64, 64, 64), 64, False),
        ("128->128 @64^2", (32, 64, 64, 128), 128, False),
        # the imagen cascade SR stage's narrow site (bench cascade batch
        # 16, sr dim=64 level-0 maps at 128px — VERDICT item 5): if the
        # fused kernel wins here, a GN(8)+SiLU prologue variant for
        # ResnetBlock is worth building
        ("b16 64->64 @128^2 (SR site)", (16, 128, 128, 64), 64, False),
    ]
    for name, shape, cout, residual in sites:
        b, h, w, c = shape
        x = jax.random.normal(rng, shape, jnp.bfloat16)
        kw = 0.05 * jax.random.normal(rng, (3, 3, c, cout), jnp.float32)
        gamma = jnp.ones((cout,))
        beta = jnp.zeros((cout,))
        # dense-conv FLOPs (the packed kernel does 2x internally; report
        # the useful-FLOP rate so numbers compare with probe_conv_r3)
        flops = 2 * b * h * w * 9 * c * cout

        def xla_fn(y, kw=kw, cout=cout, residual=residual):
            out = jax.lax.conv_general_dilated(
                y, kw.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32)
            mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
            var = jnp.mean(jnp.square(out - mean), axis=(1, 2, 3),
                           keepdims=True)
            o = (out - mean) * jax.lax.rsqrt(var + 1e-6)
            if residual:
                o = o + y.astype(jnp.float32)
            return jax.nn.gelu(o).astype(y.dtype)

        def fused_fn(y, kw=kw, gamma=gamma, beta=beta, residual=residual):
            return fused_conv_gn_gelu(
                y, kw, gamma, beta,
                residual=y if residual else None,
            )

        chain_time(f"xla   conv+gn+gelu {name}", xla_fn, x, flops)
        chain_time(f"pallas fused       {name}", fused_fn, x, flops)


def probe_in_context():
    """Flagship forward with narrow DoubleConv halves fused (fresh init —
    parameter-tree compatibility comes later if this wins)."""
    from __graft_entry__ import _example_batch, _flagship

    batch, size = 32, 128
    for fused in (False, True):
        model = _flagship()
        if fused:
            model = model.clone(fused_narrow=True)
        cond = _example_batch(jax.random.key(2), batch, size)
        params = model.init(
            jax.random.key(0), cond["img"], jnp.zeros((batch,), jnp.int32),
            cond["classifier"], cond["img_cond"], cond["lsm"], cond["topo"],
        )["params"]

        def fwd(x, model=model, params=params):
            return model.apply(
                {"params": params}, x, jnp.full((batch,), 500, jnp.int32),
                cond["classifier"], cond["img_cond"], cond["lsm"],
                cond["topo"],
            )

        x0 = jax.random.normal(jax.random.key(3), (batch, size, size, 1),
                               jnp.float32)
        chain_time(f"flagship fwd fused_narrow={fused}", fwd, x0)


def probe_sr_sites():
    """VERDICT item 5: the imagen SR stage's narrow ResnetBlock unit
    (GN(8) -> FiLM -> SiLU -> conv3x3+bias) — XLA vs the prologue-fused
    Pallas kernel (ops/fused_norm_conv.py)."""
    from diffusionmodelscustom_tpu.ops.fused_norm_conv import (
        fused_gn_silu_conv,
    )

    rng = jax.random.key(0)
    sites = [
        ("sr 64->64 @128^2 b16 film", (16, 128, 128, 64), 64, True),
        ("sr 64->64 @128^2 b16", (16, 128, 128, 64), 64, False),
        ("sr 48->48 @64^2 b20 film", (20, 64, 64, 48), 48, True),
    ]
    for name, shape, cout, film in sites:
        b, h, w, c = shape
        x = jax.random.normal(rng, shape, jnp.bfloat16)
        kw = 0.05 * jax.random.normal(rng, (3, 3, c, cout), jnp.float32)
        gamma = jnp.ones((c,))
        beta = jnp.zeros((c,))
        bias = jnp.zeros((cout,))
        fs = 0.1 * jax.random.normal(jax.random.key(5), (b, c), jnp.float32)
        fh = 0.1 * jax.random.normal(jax.random.key(6), (b, c), jnp.float32)
        flops = 2 * b * h * w * 9 * c * cout

        def xla_fn(y, kw=kw, film=film, fs=fs, fh=fh, bias=bias):
            yf = y.astype(jnp.float32).reshape(b, h * w, 8, c // 8)
            mean = jnp.mean(yf, axis=(1, 3), keepdims=True)
            var = jnp.mean(jnp.square(yf - mean), axis=(1, 3), keepdims=True)
            o = ((yf - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(
                b, h, w, c)
            if film:
                o = o * (fs[:, None, None, :] + 1.0) + fh[:, None, None, :]
            o = jax.nn.silu(o)
            return (jax.lax.conv_general_dilated(
                o.astype(y.dtype), kw.astype(y.dtype), (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32) + bias).astype(y.dtype)

        def fused_fn(y, kw=kw, film=film, fs=fs, fh=fh, bias=bias):
            return fused_gn_silu_conv(
                y, kw, gamma, beta, bias, groups=8,
                film_scale=fs if film else None,
                film_shift=fh if film else None,
            )

        chain_time(f"xla   gn+silu+conv {name}", xla_fn, x, flops)
        chain_time(f"pallas prol-fused  {name}", fused_fn, x, flops)


def probe_sr_context(batch=16):
    """Bench-cascade SR unet forward, unfused vs fused_narrow."""
    from diffusionmodelscustom_tpu.models.imagen import ImagenUNet

    sr_kw = dict(
        dim=64, dim_mults=(1, 2, 4), channels=3, text_embed_dim=768,
        num_resnet_blocks=2, layer_attns=(False, False, True),
        layer_cross_attns=(False, False, True), attn_heads=4,
        lowres_cond=True, dtype=jnp.bfloat16,
    )
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (batch, 128, 128, 3), jnp.float32)
    nc = jnp.zeros((batch,))
    te = jax.random.normal(jax.random.key(1), (batch, 8, 768))
    tm = jnp.ones((batch, 8), bool)
    kwargs = dict(text_embeds=te, text_mask=tm,
                  lowres_cond_img=jnp.zeros_like(x), lowres_noise_cond=nc)
    for fused in (False, True):
        unet = ImagenUNet(**sr_kw, fused_narrow=fused)
        params = unet.init(rng, x, nc, **kwargs)
        fwd = lambda xx: unet.apply(params, xx, nc, **kwargs)
        chain_time(f"sr unet fwd fused_narrow={fused}", fwd, x)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    if "--sr" in sys.argv:
        probe_sr_sites()
        probe_sr_context()
    else:
        probe_isolated()
        if "--context" in sys.argv:
            probe_in_context()
