"""Config tree + CLI parsing + profiling-utility tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodelscustom_tpu.utils import (
    ExperimentConfig,
    StepTimer,
    count_params,
    model_summary,
)


class TestConfig:
    def test_yaml_round_trip(self, tmp_path):
        cfg = ExperimentConfig()
        cfg.save_yaml(tmp_path / "c.yaml")
        cfg2 = ExperimentConfig.load_yaml(tmp_path / "c.yaml")
        assert cfg2.to_dict() == cfg.to_dict()

    def test_dotted_update(self):
        cfg = ExperimentConfig().update(
            {"training.lr": 1e-5, "diffusion.n_timesteps": 800, "unet.family": "danra"}
        )
        assert cfg.training.lr == 1e-5
        assert cfg.diffusion.n_timesteps == 800
        assert cfg.unet.family == "danra"

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            ExperimentConfig().update({"training.nope": 1})
        with pytest.raises(KeyError):
            ExperimentConfig().update({"nosection.lr": 1})

    def test_tuple_coercion_from_yaml(self, tmp_path):
        cfg = ExperimentConfig()
        cfg.save_yaml(tmp_path / "c.yaml")
        cfg2 = ExperimentConfig.load_yaml(tmp_path / "c.yaml")
        assert isinstance(cfg2.data.hr_shape, tuple)


class TestTrainCLI:
    def test_flags_map_to_config(self):
        from diffusionmodelscustom_tpu.cli.train import build_parser, config_from_args

        args = build_parser().parse_args(
            ["--epochs", "3", "--lr", "0.01", "--beta_scheduler", "cosine",
             "--hr_size", "32", "--set", "training.ema=false"]
        )
        cfg = config_from_args(args)
        assert cfg.training.epochs == 3
        assert cfg.training.lr == 0.01
        assert cfg.diffusion.beta_scheduler == "cosine"
        assert cfg.data.hr_shape == (32, 32)
        assert cfg.training.ema is False

    def test_model_registry(self):
        from diffusionmodelscustom_tpu.cli.train import build_model, build_parser, config_from_args

        for family in ("flagship", "danra", "danra_ffn"):
            args = build_parser().parse_args(["--model_family", family])
            model = build_model(config_from_args(args))
            assert model is not None

    def test_unknown_family(self):
        from diffusionmodelscustom_tpu.cli.train import build_model

        cfg = ExperimentConfig().update({"unet.family": "resnet"})
        with pytest.raises(ValueError):
            build_model(cfg)


class TestImagenCLI:
    def test_default_config_round_trip(self):
        from diffusionmodelscustom_tpu.cli.imagen_cli import RootConfig, _build_cascade

        cfg = RootConfig(**json.loads(RootConfig().model_dump_json()))
        cascade, text_dim = _build_cascade(cfg)
        assert text_dim == 768
        assert len(cascade.unets) == 2
        assert getattr(cascade.unets[1], "lowres_cond", False)

    def test_elucidated_dispatch(self):
        from diffusionmodelscustom_tpu.cli.imagen_cli import RootConfig, _build_cascade
        from diffusionmodelscustom_tpu.models.imagen import ElucidatedImagen

        cfg = RootConfig(type="elucidated")
        cascade, _ = _build_cascade(cfg)
        assert isinstance(cascade, ElucidatedImagen)


class TestProfiling:
    def test_model_summary_counts(self):
        params = {"enc": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))},
                  "dec": {"w": jnp.zeros((8,))}}
        text = model_summary(params)
        assert "TOTAL" in text and "28" in text
        assert count_params(params) == 28

    def test_step_timer(self):
        t = StepTimer(batch_size=4)
        for _ in range(3):
            with t.step():
                pass
        assert t.count == 3
        assert np.isfinite(t.steps_per_sec)


def test_reference_default_config_roundtrips():
    # The reference's shipped default_config.json (3-unet 64->256->1024
    # cascade, default_config.json:1-49) must parse into our schema and
    # build a cascade with random-crop SR training configured.
    import json as _json
    import pathlib

    from diffusionmodelscustom_tpu.cli.imagen_cli import RootConfig, _build_cascade

    ref = pathlib.Path("/root/reference/CascadedDDPM/default_config.json")
    if not ref.exists():
        import pytest

        pytest.skip("reference tree not mounted")
    cfg = RootConfig(**_json.loads(ref.read_text()))
    assert cfg.imagen.image_sizes == [64, 256, 1024]
    assert cfg.imagen.random_crop_sizes == [None, 64, 256]
    assert cfg.imagen.text_encoder_name == "google/t5-v1_1-large"
    cascade, text_dim = _build_cascade(cfg)
    assert len(cascade.unets) == 3
    assert cascade.random_crop_sizes == [None, 64, 256]
    assert text_dim == 1024  # t5-v1_1-large
    assert cascade.unets[1].lowres_cond and not cascade.unets[0].lowres_cond
    # roundtrip through json
    again = RootConfig(**_json.loads(cfg.model_dump_json()))
    assert again.imagen.unets[0].dim == 512


def test_new_unet_knobs_flow_through_config():
    from diffusionmodelscustom_tpu.cli.imagen_cli import (
        RootConfig, UnetConfig, ImagenConfigSchema, _build_cascade,
    )

    cfg = RootConfig(
        imagen=ImagenConfigSchema(
            image_sizes=[16],
            unets=[UnetConfig(
                dim=16, dim_mults=[1, 2], num_resnet_blocks=1,
                layer_attns=[False, True], layer_cross_attns=[False, True],
                use_linear_attn=[True, False], cosine_sim_attn=True,
                scale_skip_connection=True, combine_upsample_fmaps=True,
                attn_heads=2,
            )],
        )
    )
    cascade, _ = _build_cascade(cfg)
    u = cascade.unets[0]
    assert u.cosine_sim_attn and u.scale_skip_connection
    assert u.combine_upsample_fmaps
    assert tuple(u.use_linear_attn) == (True, False)


def test_generate_cli_end_to_end(tmp_path):
    """C14 surface: synthetic train-free generation emits the reference's
    npz bundle set, exercising the jitted per-batch-size sampler cache
    (4 + tail-2 batches)."""
    from diffusionmodelscustom_tpu.cli.generate import main

    rc = main([
        "--platform", "cpu", "--synthetic",
        "--n_samples", "6", "--sample_batch", "4", "--hr_size", "16",
        "--sampler", "ddim", "--ddim_steps", "5",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "diffusion.n_timesteps=20",
        "--set", "unet.base_channels=8",
    ])
    assert rc == 0
    out = tmp_path / "runs" / "generated_samples"
    import numpy as np

    gen = np.load(out / "gen_samples.npz")["data"]
    ev = np.load(out / "eval_samples.npz")["data"]
    assert gen.shape[0] == 6 and ev.shape[0] == 6
    assert np.isfinite(gen).all()


def test_generate_cli_ancestral_churn(tmp_path):
    """--churn wires diffusion.churn into the ancestral sampler's
    stochastic-churn scan (sampling/ancestral.py churn_step) end-to-end."""
    from diffusionmodelscustom_tpu.cli.generate import main

    rc = main([
        "--platform", "cpu", "--synthetic",
        "--n_samples", "2", "--sample_batch", "2", "--hr_size", "16",
        "--sampler", "ancestral", "--churn", "0.3",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "diffusion.n_timesteps=20",
        "--set", "unet.base_channels=8",
    ])
    assert rc == 0
    import numpy as np

    gen = np.load(
        tmp_path / "runs" / "generated_samples" / "gen_samples.npz"
    )["data"]
    assert gen.shape[0] == 2 and np.isfinite(gen).all()


def test_imagen_cli_train_and_sample_end_to_end(tmp_path):
    """C36 surface: imagen train --synthetic trains a stage and saves its
    state; imagen sample restores it and writes an npz image bundle."""
    import json as _json

    from click.testing import CliRunner

    from diffusionmodelscustom_tpu.cli.imagen_cli import imagen

    cfg = {
        "type": "elucidated",
        "imagen": {
            "image_sizes": [8],
            "text_encoder_name": "google/t5-v1_1-base",
            "unets": [
                {
                    "dim": 16,
                    "dim_mults": [1, 2],
                    "num_resnet_blocks": 1,
                    "layer_attns": [False, True],
                    "layer_cross_attns": [False, True],
                    "attn_heads": 2,
                }
            ],
        },
        "trainer": {"lr": 1e-3, "checkpoint_every": 2},
        "dataset": {"batch_size": 2},
        "checkpoint_path": str(tmp_path / "ckpts"),
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(_json.dumps(cfg))

    runner = CliRunner()
    r = runner.invoke(
        imagen,
        ["train", "--config", str(cfg_path), "--unet", "1", "--steps", "3",
         "--synthetic"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert (tmp_path / "ckpts" / "unet1").exists()
    # checkpoint_every fired (requires checkpoint_path to reach
    # ImagenTrainerConfig — the knob was inert before round 3's fix);
    # periodic checkpoints land as <checkpoint_path>/ckpt_<steps>/
    periodic = list((tmp_path / "ckpts").glob("ckpt_*"))
    assert periodic, list((tmp_path / "ckpts").iterdir())

    out = tmp_path / "sample.npz"
    r = runner.invoke(
        imagen,
        ["sample", "--config", str(cfg_path), "--output", str(out),
         "--batch_size", "1", "--cond_scale", "2.0", "a synthetic field"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    import numpy as np

    arr = np.load(out)["images"] if "images" in np.load(out) else np.load(out)[np.load(out).files[0]]
    assert arr.shape[0] == 1 and np.isfinite(arr).all()


def test_distill_cli_end_to_end(tmp_path):
    """cli.distill: train a tiny teacher via cli.train, distill it down
    the halving schedule, and sample with the distilled student at its
    manifest budget (the full few-step serving workflow)."""
    import json as _json

    import numpy as np

    from diffusionmodelscustom_tpu.cli.distill import main as distill_main
    from diffusionmodelscustom_tpu.cli.train import main as train_main

    common = [
        "--platform", "cpu", "--synthetic",
        "--hr_size", "16", "--batch_size", "8", "--n_timesteps", "16",
        "--model_family", "flagship",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "unet.base_channels=8",
        "--set", "unet.time_embedding_size=32",
    ]
    rc = train_main(common + ["--epochs", "1", "--loss_type", "simple"])
    assert rc == 0

    out = tmp_path / "distilled"
    rc = distill_main(common + [
        "--teacher", str(tmp_path / "runs" / "model_checkpoints"),
        "--start_steps", "4", "--end_steps", "2", "--steps_per_round", "2",
        "--out", str(out),
    ])
    assert rc == 0
    manifest = _json.loads((out / "manifest.json").read_text())
    assert manifest["num_steps"] == 2

    # sample with the distilled student at the manifest budget
    import jax
    import jax.numpy as jnp

    from diffusionmodelscustom_tpu.cli.train import (
        build_model, build_parser, config_from_args,
    )
    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.sampling import ddim_sample
    from diffusionmodelscustom_tpu.utils.checkpoint import restore_pytree

    args = build_parser().parse_args(common)
    cfg = config_from_args(args)
    model = build_model(cfg)
    x = jnp.zeros((1, 16, 16, 1))
    template = model.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32))[
        "params"
    ]
    params = restore_pytree(out / "params", template)
    diff = GaussianDiffusion.create(n_timesteps=16)
    sample = ddim_sample(
        lambda xx, tt: model.apply({"params": params}, xx, tt),
        diff, jax.random.key(1), (1, 16, 16, 1),
        num_steps=manifest["num_steps"],
    )
    assert np.isfinite(np.asarray(sample)).all()


def test_train_cli_device_feed_end_to_end(tmp_path, capsys):
    """--device_feed: the full CLI training loop over packed uint16
    buffers with on-device geo reconstruction (data/device_feed.py) —
    conditional seasons + images + lsm/topo + sdf loss so every
    reconstructed channel is on the training path. A temporal validation
    split runs through the SAME packed-buffer path (the valid
    CompactBatcher), covering both feeds in one run."""
    import json as _json
    import math

    from diffusionmodelscustom_tpu.cli.train import main as train_main

    rc = train_main([
        "--platform", "cpu", "--synthetic", "--device_feed",
        "--hr_size", "16", "--batch_size", "8", "--n_timesteps", "16",
        "--model_family", "flagship", "--epochs", "1",
        "--loss_type", "sdfweighted",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "unet.base_channels=8",
        "--set", "unet.time_embedding_size=32",
        "--set", "unet.num_classes=4",
        "--set", "unet.cond_on_img=true",
        "--set", "data.cutouts=true",
        "--set", "data.split_type=temporal",
        "--set", "data.val_size=0.2",
        "--set", "data.test_size=0.0",
        "--set", "data.train_size=0.8",
    ])
    assert rc == 0
    out = capsys.readouterr()
    assert "validation split: " in out.err
    summary = _json.loads(
        [ln for ln in out.out.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["final_valid_loss"] is not None
    assert math.isfinite(summary["final_valid_loss"])
    cfgs = list((tmp_path / "runs").glob("*_config.yaml"))
    assert cfgs, "config yaml not written"
    # checkpoint written and restorable implies the packed-buffer epoch ran
    assert (tmp_path / "runs" / "model_checkpoints").exists()


def test_train_cli_validation_split_end_to_end(tmp_path, capsys):
    """data.split_type carves a held-out validation set: the epoch logs a
    real (non-nan) valid loss and the split is disjoint from training
    (the earlier behavior scored 'validation' on the training loader)."""
    from diffusionmodelscustom_tpu.cli.train import main as train_main

    rc = train_main([
        "--platform", "cpu", "--synthetic",
        "--hr_size", "16", "--batch_size", "8", "--n_timesteps", "16",
        "--model_family", "flagship", "--epochs", "1",
        "--path_data", str(tmp_path / "data"),
        "--path_save", str(tmp_path / "runs"),
        "--set", "unet.base_channels=8",
        "--set", "unet.time_embedding_size=32",
        "--set", "data.split_type=random",
        "--set", "data.val_size=0.2",
        "--set", "data.test_size=0.0",
        "--set", "data.train_size=0.8",
    ])
    assert rc == 0
    out = capsys.readouterr()
    assert "validation split: " in out.err
    summary = json.loads(
        [ln for ln in out.out.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["final_valid_loss"] is not None
    import math

    assert math.isfinite(summary["final_valid_loss"])
