"""End-to-end HTTP serving drive with REAL weights + the measured recipe
(round-4 VERDICT item 8).

Takes the promoted 12-step distilled student
(``artifacts/distill_student_12.bin`` — the exact weights bench.py's
distilled serving line times), converts it into a ``cli.distill``-format
student dir (save_pytree params + manifest), and serves it through the
REAL ``cli/serve.py`` HTTP stack with the measured few-step recipe
(DDIM, steps pinned by the manifest, churn 0.1, clip_denoised). Asserts:

- /healthz answers, /info reports the active sampler/steps/churn/clip
  (the recipe actually landed in the compiled sampler),
- /sample returns finite fields of the right shape with conditioning
  attached.

Runs on CPU (float32 compute — the param tree is identical) so it can be
used as the round's serving verify drive without touching the TPU.

Run: python scripts/serve_drive.py
"""

import io
import json
import pathlib
import sys
import tempfile
import threading
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    from flax import serialization

    from diffusionmodelscustom_tpu.models import ConditionalUNet
    from diffusionmodelscustom_tpu.utils.checkpoint import save_pytree

    student_blob = REPO / "artifacts" / "distill_student_12.bin"
    if not student_blob.exists():
        raise SystemExit(f"{student_blob} missing — run distill_fresh.py")

    # the parity-flagship architecture the student was distilled on
    # (scripts/make_parity.py run_variant)
    model = ConditionalUNet(
        out_channels=1, base_channels=64, time_dim=256, n_heads=4,
        num_classes=4, cond_img_channels=1, cond_on_lsm=True,
        cond_on_topo=True, attention_levels=(1, 2, 3),
        attention_levels_up=(2, 1), dtype=jnp.bfloat16,
    )
    tmpl = model.init(
        jax.random.key(0),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)),
    )["params"]
    params = serialization.from_bytes(tmpl, student_blob.read_bytes())
    print("student params loaded", file=sys.stderr)

    tmp = pathlib.Path(tempfile.mkdtemp())
    ddir = tmp / "distilled"
    ddir.mkdir(parents=True)
    save_pytree(ddir / "params", params)
    (ddir / "manifest.json").write_text(json.dumps({
        "num_steps": 12, "start_steps": 400,
        "source": "artifacts/distill_student_12.bin",
    }))

    from diffusionmodelscustom_tpu.cli.serve import (
        SamplerService,
        build_serve_parser,
        make_handler,
    )
    from http.server import ThreadingHTTPServer

    args = build_serve_parser().parse_args([
        "--platform", "cpu", "--synthetic",
        "--hr_size", "64", "--batch_size", "4", "--n_timesteps", "800",
        "--model_family", "flagship", "--sample_batch", "1",
        "--distilled", str(ddir),
        "--churn", "0.1", "--clip_denoised",
        "--path_data", str(tmp / "data"),
        "--path_save", str(tmp / "runs"),
        "--set", "unet.cond_on_img=true",
        "--set", "unet.cond_on_lsm=true",
        "--set", "unet.cond_on_topo=true",
        "--set", "unet.attention_levels_up=[2,1]",
        "--set", "unet.precision=float32",
    ])
    service = SamplerService(args)  # compiles + warms the real sampler
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"
        info = json.loads(urllib.request.urlopen(f"{base}/info").read())
        print("info:", info, file=sys.stderr)
        assert info["sampler"] == "ddim" and info["steps"] == 12
        assert abs(info["churn"] - 0.1) < 1e-9
        assert info["clip_denoised"] is True
        req = urllib.request.Request(
            f"{base}/sample", data=json.dumps({"seed": 5}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        arrays = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
        gen = arrays["gen"]
        assert gen.shape == (1, 64, 64, 1) and np.isfinite(gen).all()
        print(f"SERVE DRIVE OK: gen range [{gen.min():.3f}, "
              f"{gen.max():.3f}], recipe ddim12+churn0.1+clip "
              f"on the real distilled student", file=sys.stderr)
    finally:
        server.shutdown()
        server.server_close()


if __name__ == "__main__":
    main()
