"""Sampling server (cli/serve.py): HTTP surface test on a tiny model."""

import io
import json
import threading
import urllib.request

import numpy as np


def test_serve_health_info_and_sample(tmp_path):
    from http.server import ThreadingHTTPServer

    from diffusionmodelscustom_tpu.cli.serve import (
        SamplerService,
        build_serve_parser,
        make_handler,
    )

    args = build_serve_parser().parse_args([
        "--platform", "cpu", "--synthetic",
        "--hr_size", "16", "--batch_size", "8", "--n_timesteps", "8",
        "--model_family", "flagship", "--sampler", "ddim", "--ddim_steps", "4",
        "--sample_batch", "2",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "unet.base_channels=8",
        "--set", "unet.time_embedding_size=32",
    ])
    service = SamplerService(args)  # compiles + warms the sampler
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"
        info = json.loads(urllib.request.urlopen(f"{base}/info").read())
        assert info["sampler"] == "ddim" and info["steps"] == 4
        assert info["batch"] == 2

        req = urllib.request.Request(
            f"{base}/sample",
            data=json.dumps({"seed": 3}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        body = urllib.request.urlopen(req).read()
        arrays = np.load(io.BytesIO(body))
        assert arrays["gen"].shape == (2, 16, 16, 1)
        assert np.isfinite(arrays["gen"]).all()
        # conditioning used for the request is returned alongside
        assert "lsm" in arrays.files and "classifier" in arrays.files
    finally:
        server.shutdown()
        server.server_close()


def test_serve_restart_recipe(tmp_path):
    """The round-5 restart serving recipe flows through the HTTP stack:
    /info reports the active restart knobs and /sample works."""
    from http.server import ThreadingHTTPServer

    from diffusionmodelscustom_tpu.cli.serve import (
        SamplerService,
        build_serve_parser,
        make_handler,
    )

    args = build_serve_parser().parse_args([
        "--platform", "cpu", "--synthetic",
        "--hr_size", "16", "--batch_size", "8", "--n_timesteps", "16",
        "--model_family", "flagship", "--sampler", "ddim",
        "--ddim_steps", "4", "--sample_batch", "2",
        "--churn", "0.2", "--clip_denoised",
        "--restart_t", "6", "--restart_steps", "2",
        "--restart_churn", "0.5",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "unet.base_channels=8",
        "--set", "unet.time_embedding_size=32",
    ])
    service = SamplerService(args)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        info = json.loads(urllib.request.urlopen(f"{base}/info").read())
        assert info["restart_steps"] == 2 and info["restart_t"] == 6
        assert abs(info["restart_churn"] - 0.5) < 1e-9
        req = urllib.request.Request(
            f"{base}/sample",
            data=json.dumps({"seed": 1}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        arrays = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
        assert arrays["gen"].shape == (2, 16, 16, 1)
        assert np.isfinite(arrays["gen"]).all()
    finally:
        server.shutdown()
        server.server_close()
