"""Drill-down for the cascade attention sink found by probe_cascade_r4:

full base unet fwd = 59.6 ms but removing EITHER the TransformerBlocks
(layer_attns) OR the ResBlock cross-attention (layer_cross_attns) drops
it to ~9 ms — the cost is non-additive, so it's an interaction (layout /
scheduling), not a hot op. This script bisects: single blocks alone, the
pair, per-level unet variants, and layer_attns_add_text_cond on/off.

Run (TPU, alone):  python scripts/probe_cascade_attn.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from diffusionmodelscustom_tpu.models.imagen import ImagenUNet
from diffusionmodelscustom_tpu.models.imagen.unet import (
    ResnetBlock,
    TransformerBlock,
)

TEXT_DIM = 768
B = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[:8]))


def chain_time(fn, x, n=8):
    @jax.jit
    def chained(x0):
        def body(c, _):
            y = fn(c)
            return c * 0.999 + jnp.mean(y).astype(c.dtype) * 1e-6, ()

        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    # the axon remote runtime stalls ~55-70 ms on the first timed
    # execution of a fresh (executable, buffer) pair -- warm twice and
    # take the min of 3 timed repeats (see probe_attn_ops findings)
    sync(chained(x))
    best = float("inf")
    for rep in range(3):
        xin = x * (1.0 + 1e-4 * (rep + 1))
        t0 = time.perf_counter()
        sync(chained(xin))
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def probe_blocks():
    """Isolated blocks at the base unet's level-2 shape (32px, 256ch)."""
    results = {}
    ctx = jax.random.normal(jax.random.key(1), (B, 12, 512), jnp.float32)
    cmask = jnp.ones((B, 12), bool)
    for size, ch in ((32, 256), (16, 384)):
        x = jax.random.normal(jax.random.key(0), (B, size, size, ch))

        tb = TransformerBlock(n_heads=4, dtype=jnp.bfloat16)
        p_tb = tb.init(jax.random.key(2), x, ctx)
        ms = chain_time(lambda xx: tb.apply(p_tb, xx, ctx), x)
        results[f"tb_ctx_{size}px{ch}"] = ms
        log(f"TransformerBlock+ctx   {size}px {ch}ch: {ms:7.2f} ms")

        ms = chain_time(lambda xx: tb.apply(p_tb, xx, None), x)
        results[f"tb_noctx_{size}px{ch}"] = ms
        log(f"TransformerBlock noctx {size}px {ch}ch: {ms:7.2f} ms")

        rb = ResnetBlock(ch, cond_dim=512, time_cond_dim=512, dtype=jnp.bfloat16)
        t_emb = jax.random.normal(jax.random.key(3), (B, 512))
        p_rb = rb.init(jax.random.key(4), x, t_emb, ctx, cmask)
        ms = chain_time(lambda xx: rb.apply(p_rb, xx, t_emb, ctx, cmask), x)
        results[f"rb_cross_{size}px{ch}"] = ms
        log(f"ResBlock+crossattn     {size}px {ch}ch: {ms:7.2f} ms")

        def pair(xx):
            h = rb.apply(p_rb, xx, t_emb, ctx, cmask)
            return tb.apply(p_tb, h, ctx)

        ms = chain_time(pair, x)
        results[f"pair_{size}px{ch}"] = ms
        log(f"ResBlock->Transformer  {size}px {ch}ch: {ms:7.2f} ms")
    return results


def probe_unet_variants():
    """Full base unet with attention narrowed per level / context knob."""
    base_kw = dict(
        dim=128, dim_mults=(1, 2, 3), channels=3, text_embed_dim=TEXT_DIM,
        num_resnet_blocks=2, layer_attns=(False, True, True),
        layer_cross_attns=(False, True, True), attn_heads=4,
        dtype=jnp.bfloat16,
    )
    variants = {
        "full": {},
        "attn_lvl2_only": {"layer_attns": (False, True, False)},
        "attn_lvl3_only": {"layer_attns": (False, False, True)},
        "cross_lvl2_only": {"layer_cross_attns": (False, True, False)},
        "cross_lvl3_only": {"layer_cross_attns": (False, False, True)},
        "no_text_cond_in_selfattn": {"layer_attns_add_text_cond": False},
        "no_mid_attn": {"attend_at_middle": False},
    }
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (B, 64, 64, 3), jnp.float32)
    nc = jnp.zeros((B,))
    te = jax.random.normal(jax.random.key(1), (B, 8, TEXT_DIM))
    tm = jnp.ones((B, 8), bool)
    out = {}
    for name, over in variants.items():
        kw = dict(base_kw, **over)
        unet = ImagenUNet(**kw)
        params = unet.init(rng, x, nc, text_embeds=te, text_mask=tm)
        ms = chain_time(
            lambda xx: unet.apply(params, xx, nc, text_embeds=te, text_mask=tm),
            x,
        )
        out[name] = round(ms, 2)
        log(f"unet/{name:26s}: {ms:7.2f} ms/fwd")
    return out


def main():
    log(f"backend={jax.default_backend()}")
    report = {"blocks": probe_blocks(), "unet": probe_unet_variants()}
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
