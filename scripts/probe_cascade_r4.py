"""Round-4 cascade MFU hunt: where do the EDM-32 cascade's ms go?

bench.py --config cascade measures 13.25 samples/s/chip at batch 16 —
~8 TF/s utilized, ~5% of the chip (VERDICT r1 weak #2). This script
decomposes that: per-stage sample time, per-unet forward time + FLOPs
(in-jit chained calls so the ~1-2 ms per-dispatch cost cancels,
CLAUDE.md timing discipline), and an ablation matrix over the blocks
(self-attn off, cross-attn off, resnet depth) to locate the sink.

Run (TPU, alone):  python scripts/probe_cascade_r4.py [--batch 16]
"""

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from diffusionmodelscustom_tpu.core import EDMConfig
from diffusionmodelscustom_tpu.models.imagen import ElucidatedImagen, ImagenUNet

TEXT_DIM = 768


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[:8]))


def chain_time(fn, x, n=8, depends=True):
    """Time n chained in-jit calls; input of call i+1 depends on output i
    (true device time; per-call fixed costs cancel as n grows)."""

    @jax.jit
    def chained(x0):
        def body(c, _):
            y = fn(c)
            # fold output back into an input-shaped carrier
            c2 = c * 0.999 + jnp.mean(y) * 1e-6
            return c2, ()

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


def unet_defs(batch):
    """The bench's two stages (bench.py:164-185)."""
    base = dict(
        dim=128, dim_mults=(1, 2, 3), channels=3, text_embed_dim=TEXT_DIM,
        num_resnet_blocks=2, layer_attns=(False, True, True),
        layer_cross_attns=(False, True, True), attn_heads=4,
        dtype=jnp.bfloat16,
    )
    sr = dict(
        dim=64, dim_mults=(1, 2, 4), channels=3, text_embed_dim=TEXT_DIM,
        num_resnet_blocks=2, layer_attns=(False, False, True),
        layer_cross_attns=(False, False, True), attn_heads=4,
        lowres_cond=True, dtype=jnp.bfloat16,
    )
    return base, sr


def probe_unet(name, kw, size, batch, lowres=False, n=8):
    unet = ImagenUNet(**kw)
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (batch, size, size, 3), jnp.float32)
    nc = jnp.zeros((batch,))
    te = jax.random.normal(jax.random.key(1), (batch, 8, TEXT_DIM))
    tm = jnp.ones((batch, 8), bool)
    kwargs = dict(text_embeds=te, text_mask=tm)
    if lowres:
        kwargs.update(
            lowres_cond_img=jnp.zeros_like(x), lowres_noise_cond=nc
        )
    params = unet.init(rng, x, nc, **kwargs)

    fwd = lambda xx: unet.apply(params, xx, nc, **kwargs)
    # FLOP estimate from XLA cost analysis
    try:
        cost = jax.jit(fwd).lower(x).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    ms = chain_time(fwd, x, n=n)
    tfs = flops / (ms * 1e-3) / 1e12 if flops else float("nan")
    log(f"{name:28s} {size:4d}px b{batch}: {ms:7.2f} ms/fwd  "
        f"{flops/1e9:7.1f} GF  {tfs:6.1f} TF/s")
    return {"name": name, "size": size, "ms": round(ms, 3),
            "gflops": round(flops / 1e9, 2), "tf_s": round(tfs, 2)}


def probe_stage_walks(batch):
    """Per-stage EDM sample time inside one jitted cascade walk."""
    base_kw, sr_kw = unet_defs(batch)
    unets = [ImagenUNet(**base_kw), ImagenUNet(**sr_kw)]
    cascade = ElucidatedImagen(
        unets=unets, image_sizes=(64, 128), channels=3,
        edm=EDMConfig(num_sample_steps=32),
    )
    rng = jax.random.key(0)
    params = [
        cascade.init_unet_params(i, jax.random.fold_in(rng, i),
                                 text_embed_dim=TEXT_DIM)
        for i in range(2)
    ]
    te = jax.random.normal(jax.random.key(1), (batch, 8, TEXT_DIM))
    tm = jnp.ones((batch, 8), bool)

    results = {}
    # stage 1 only
    fn1 = jax.jit(lambda p, k: cascade.sample(
        p, k, batch_size=batch, text_embeds=te, text_mask=tm,
        stop_at_unet_number=1))
    sync(fn1(params, jax.random.key(2)))
    t0 = time.perf_counter()
    sync(fn1(params, jax.random.key(3)))
    results["stage1_s"] = time.perf_counter() - t0
    log(f"stage 1 (base 64px) walk: {results['stage1_s']:.3f}s")

    # both stages
    fn2 = jax.jit(lambda p, k: cascade.sample(
        p, k, batch_size=batch, text_embeds=te, text_mask=tm))
    sync(fn2(params, jax.random.key(2)))
    t0 = time.perf_counter()
    sync(fn2(params, jax.random.key(3)))
    results["both_s"] = time.perf_counter() - t0
    results["stage2_s"] = results["both_s"] - results["stage1_s"]
    results["samples_per_s"] = batch / results["both_s"]
    log(f"both stages: {results['both_s']:.3f}s -> "
        f"{results['samples_per_s']:.2f} samples/s "
        f"(stage2 ~ {results['stage2_s']:.3f}s)")
    return results


def probe_ablations(batch, n=8):
    """Knock out block families in each unet to locate the time sink."""
    base_kw, sr_kw = unet_defs(batch)
    out = []
    for name, kw, size, lowres in (
        ("base", base_kw, 64, False), ("sr", sr_kw, 128, True)
    ):
        out.append(probe_unet(f"{name}/full", dict(kw), size, batch, lowres, n))
        nk = dict(kw); nk["layer_attns"] = (False,) * 3
        out.append(probe_unet(f"{name}/no_self_attn", nk, size, batch, lowres, n))
        nk = dict(kw); nk["layer_cross_attns"] = (False,) * 3
        out.append(probe_unet(f"{name}/no_cross_attn", nk, size, batch, lowres, n))
        nk = dict(kw)
        nk["layer_attns"] = (False,) * 3
        nk["layer_cross_attns"] = (False,) * 3
        out.append(probe_unet(f"{name}/convs_only", nk, size, batch, lowres, n))
        nk = dict(kw); nk["num_resnet_blocks"] = 1
        out.append(probe_unet(f"{name}/resnet1", nk, size, batch, lowres, n))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--skip-walks", action="store_true")
    ap.add_argument("--skip-ablations", action="store_true")
    args = ap.parse_args()
    log(f"backend={jax.default_backend()}")

    report = {}
    if not args.skip_walks:
        report["walks"] = probe_stage_walks(args.batch)
    if not args.skip_ablations:
        report["ablations"] = probe_ablations(args.batch)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
