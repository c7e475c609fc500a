"""Minimal production-style sampling server (stdlib HTTP, no deps).

Loads a trained checkpoint (or a ``cli.distill`` student), compiles ONE
fixed-shape sampler at startup (paying the trace/compile once, the AOT
philosophy of ``utils/serving.py``), then serves:

    GET  /healthz            -> 200 "ok"
    GET  /info               -> JSON {model_family, sampler, steps, batch}
    POST /sample {"seed": N} -> application/x-npz with arrays
                                gen (B,H,W,1) + the conditioning used

Conditioning is drawn round-robin from the configured dataset (the
serving-side analogue of the reference's generation script pairing,
generation_DANRA_conditional.py:380-429). One request is in flight at a
time — a single accelerator runs one sampler anyway.

    python -m diffusionmodelscustom_tpu.cli.serve \\
        --synthetic --path_data data/ --path_save runs/ \\
        --port 8787 [--distilled runs/distilled] [--conv_quant]
"""

from __future__ import annotations

import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from .train import apply_platform, build_data, build_model, build_parser, config_from_args


def build_serve_parser():
    p = build_parser()
    p.prog = "diffusionmodelscustom_tpu.cli.serve"
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--sample_batch", type=int, default=1,
                   help="fixed batch of the compiled sampler")
    p.add_argument("--sampler", type=str, default=None,
                   choices=["ancestral", "ddim", "dpmpp"])
    p.add_argument("--ddim_steps", type=int, default=None)
    p.add_argument("--churn", type=float, default=None,
                   help="sample-time churn (ancestral + ddim); 0.1 + "
                        "--clip_denoised is the measured few-step "
                        "serving recipe (docs/FEWSTEP.md)")
    p.add_argument("--clip_denoised", action="store_true", default=None,
                   help="clamp per-step x0 to [-1, 1]")
    p.add_argument("--restart_t", type=int, default=None,
                   help="restart re-descent start timestep (with "
                        "--restart_steps; measured recipes in "
                        "docs/FEWSTEP.md restart table)")
    p.add_argument("--restart_steps", type=int, default=None,
                   help="extra re-descent steps after the base ddim "
                        "chain (0 = off)")
    p.add_argument("--restart_churn", type=float, default=None,
                   help="churn for the re-descent phase")
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no-use_ema", dest="use_ema", action="store_false",
                   help="serve the raw (non-EMA) parameters")
    p.add_argument("--distilled", type=str, default=None,
                   help="cli.distill output dir (params + manifest)")
    p.add_argument("--conv_quant", action="store_true",
                   help="dynamic-int8 serving convs (flagship only)")
    p.add_argument("--attn_pv_int8", action="store_true",
                   help="with --conv_quant: also quantize the attention "
                        "PV matmul (full int8 attention)")
    return p


class SamplerService:
    """Owns the compiled sampler + conditioning source; thread-safe."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp

        from ..core import make_process
        from ..sampling import (
            ancestral_sample,
            ddim_restart_sample,
            ddim_sample,
            dpmpp_2m_sample,
            flow_sample,
        )
        from .inference import load_inference_setup

        cfg = config_from_args(args)
        if args.sampler:
            cfg = cfg.update({"diffusion.sampler": args.sampler})
        if args.ddim_steps:
            cfg = cfg.update({"diffusion.ddim_steps": args.ddim_steps})
        if args.churn is not None:
            cfg = cfg.update({"diffusion.churn": args.churn})
        if args.clip_denoised is not None:
            cfg = cfg.update(
                {"diffusion.clip_denoised": args.clip_denoised}
            )
        for f in ("restart_t", "restart_steps", "restart_churn"):
            v = getattr(args, f)
            if v is not None:
                cfg = cfg.update({f"diffusion.{f}": v})

        model = build_model(cfg)
        diffusion = make_process(
            cfg.diffusion.process,
            n_timesteps=cfg.diffusion.n_timesteps,
            beta_min=cfg.diffusion.beta_min,
            beta_max=cfg.diffusion.beta_max,
            scheduler=cfg.diffusion.beta_scheduler,
            data_scaled=cfg.diffusion.noise_variance > 0,
            time_sampling=cfg.diffusion.flow_time_sampling,
            logit_mean=cfg.diffusion.flow_logit_mean,
            logit_std=cfg.diffusion.flow_logit_std,
        )
        dataset, loader, _ = build_data(cfg, args.synthetic)
        if args.sample_batch > cfg.training.batch_size:
            raise SystemExit(
                f"--sample_batch ({args.sample_batch}) must not exceed the "
                f"loader batch size ({cfg.training.batch_size})"
            )

        model, params, batch_stats, sampler_name, steps = (
            load_inference_setup(cfg, args, model, diffusion, loader)
        )

        b = args.sample_batch
        size = tuple(cfg.data.hr_shape)
        self._loader = loader
        self._iter = iter(loader)
        self._lock = threading.Lock()
        self.info = {
            "model_family": cfg.unet.family,
            "sampler": sampler_name,
            "steps": steps if sampler_name != "ancestral" else diffusion.n_timesteps,
            "churn": cfg.diffusion.churn,
            "clip_denoised": cfg.diffusion.clip_denoised,
            "restart_t": cfg.diffusion.restart_t,
            "restart_steps": cfg.diffusion.restart_steps,
            "restart_churn": cfg.diffusion.restart_churn,
            "batch": b,
            "image_size": list(size),
        }

        def run(y, cond, lsm, topo, key):
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats

            def denoise(x, t):
                return model.apply(variables, x, t, y, cond, lsm, topo)

            def uncond(x, t):
                return model.apply(variables, x, t, None, None, None, None)

            shape = (b, size[0], size[1], cfg.unet.out_channels)
            # honor classifier-free guidance exactly as cli.generate does
            kw = dict(
                uncond_fn=uncond if cfg.diffusion.cfg_scale > 0 else None,
                cfg_scale=cfg.diffusion.cfg_scale,
            )
            kw["clip_denoised"] = cfg.diffusion.clip_denoised
            if sampler_name == "ddim":
                # churn + clip (+ optional restart re-descent) on the
                # few-step chain is the measured matched-quality serving
                # recipe (docs/FEWSTEP.md round 5)
                if cfg.diffusion.restart_steps > 0:
                    return ddim_restart_sample(
                        denoise, diffusion, key, shape,
                        num_steps=steps,
                        restart_t=cfg.diffusion.restart_t,
                        restart_steps=cfg.diffusion.restart_steps,
                        churn=cfg.diffusion.churn,
                        restart_churn=cfg.diffusion.restart_churn,
                        **kw)
                return ddim_sample(denoise, diffusion, key, shape,
                                   num_steps=steps,
                                   churn=cfg.diffusion.churn, **kw)
            if sampler_name == "dpmpp":
                return dpmpp_2m_sample(denoise, diffusion, key, shape,
                                       num_steps=steps, **kw)
            if sampler_name == "flow":
                return flow_sample(denoise, diffusion, key, shape,
                                   num_steps=steps,
                                   method=cfg.diffusion.flow_method, **kw)
            return ancestral_sample(denoise, diffusion, key, shape,
                                    churn=cfg.diffusion.churn, **kw)

        self._run = jax.jit(run)
        self._jnp = jnp
        self._jax = jax
        # warm the executable now — requests never pay the compile
        print("[serve] compiling sampler ...", file=sys.stderr)
        with self._lock:
            batch = self._next_cond_locked()
            np.asarray(self._sample_arrays(batch, 0)["gen"])
        print("[serve] ready", file=sys.stderr)

    def _next_cond_locked(self):
        """Caller holds self._lock."""
        try:
            batch = next(self._iter)
        except StopIteration:
            self._iter = iter(self._loader)
            batch = next(self._iter)
        batch.pop("points", None)
        b = self.info["batch"]
        return {k: self._jnp.asarray(v[:b]) for k, v in batch.items()}

    def _sample_arrays(self, batch, seed: int):
        gen = self._run(
            batch.get("classifier"),
            batch.get("img_cond"),
            batch.get("lsm"),
            batch.get("topo"),
            self._jax.random.key(seed),
        )
        out = {"gen": np.asarray(gen)}
        for k in ("img", "img_cond", "lsm", "topo", "classifier"):
            if k in batch:
                out[k] = np.asarray(batch[k])
        return out

    def sample_npz(self, seed: int) -> bytes:
        # single-flight: one sampler occupies the accelerator at a time
        # (the docstring's contract — the HTTP server itself is threaded)
        with self._lock:
            batch = self._next_cond_locked()
            arrays = self._sample_arrays(batch, seed)
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        return buf.getvalue()


def make_handler(service: SamplerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # route through stderr, quiet tests
            print("[serve]", fmt % a, file=sys.stderr)

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/info":
                self._send(
                    200, json.dumps(service.info).encode(), "application/json"
                )
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/sample":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
                seed = int(req.get("seed", 0))
                body = service.sample_npz(seed)
            except Exception as e:  # surface the error to the client
                self._send(500, str(e).encode(), "text/plain")
                return
            self._send(200, body, "application/x-npz")

    return Handler


def main(argv=None) -> int:
    args = build_serve_parser().parse_args(argv)
    apply_platform(args)
    service = SamplerService(args)
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(service)
    )
    print(f"[serve] listening on {args.host}:{args.port}", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
