"""Multi-chip SPMD tests on the 8-device virtual CPU mesh — the
equivalent of multi-node testing the reference never had (SURVEY.md
section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodelscustom_tpu.core import GaussianDiffusion
from diffusionmodelscustom_tpu.models import ConditionalUNet
from diffusionmodelscustom_tpu.parallel import (
    batch_sharding,
    make_mesh,
    params_sharding,
    shard_batch,
    state_sharding,
)
from diffusionmodelscustom_tpu.train import Trainer, TrainerConfig


def tiny_trainer(**cfg_kw):
    model = ConditionalUNet(
        out_channels=1,
        base_channels=8,
        time_dim=16,
        n_heads=2,
        attention_levels=(),
        attention_levels_up=(),
    )
    diff = GaussianDiffusion.create(n_timesteps=20)
    return Trainer(model, diff, TrainerConfig(ema=False, **cfg_kw))


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(4, 2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(8, 2)  # 16 > 8 devices


def test_data_parallel_matches_single_device():
    # The sharded step must produce the same loss/params as unsharded
    # (gradient all-reduce correctness).
    trainer = tiny_trainer()
    rng = jax.random.key(0)
    batch = {"img": jax.random.normal(jax.random.key(1), (8, 8, 8, 1))}
    state = trainer.init_state(rng, batch)

    state_single, m_single = trainer.train_step(
        jax.tree_util.tree_map(jnp.copy, state), batch, jax.random.key(2)
    )

    mesh = make_mesh(8, 1)
    sharded_batch = shard_batch(mesh, batch)
    st_shard = state_sharding(mesh, state)
    state_sh = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
        state,
        st_shard,
    )
    with mesh:
        state_multi, m_multi = trainer.train_step(
            state_sh, sharded_batch, jax.random.key(2)
        )

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_multi["loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(state_single.params)[0]
    l2 = jax.tree_util.tree_leaves(state_multi.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-6)


def test_fsdp_sharding_runs():
    trainer = tiny_trainer()
    rng = jax.random.key(0)
    batch = {"img": jax.random.normal(jax.random.key(1), (8, 8, 8, 1))}
    state = trainer.init_state(rng, batch)

    mesh = make_mesh(4, 2)
    st_shard = state_sharding(mesh, state, min_size=0)
    state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
        state,
        st_shard,
    )
    batch = shard_batch(mesh, batch)
    with mesh:
        state2, metrics = trainer.train_step(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    # at least one parameter leaf is actually sharded on the model axis
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding.spec, state2.params)
    )
    assert any("model" in str(s) for s in specs)


def test_params_sharding_rules():
    mesh = make_mesh(4, 2)
    params = {
        "big": jnp.zeros((256, 128)),
        "small": jnp.zeros((4,)),
        "odd": jnp.zeros((17, 3)),
    }
    sh = params_sharding(mesh, params, min_size=64)
    assert "model" in str(sh["big"].spec)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"].spec == jax.sharding.PartitionSpec()


def test_graft_entry_dryrun_subprocess():
    # Run in a FRESH interpreter withOUT conftest so the driver's real
    # environment (sitecustomize pins a remote TPU platform with 1 device)
    # is reproduced exactly: dryrun_multichip must self-configure the
    # n-device virtual CPU mesh. Round 1 failed precisely because the
    # in-process test inherited conftest's platform config and masked this.
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        cwd=root,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0, f"stderr: {r.stderr[-2000:]}"
    assert "dryrun_multichip OK" in r.stdout


def test_global_batch_from_local_single_process():
    from diffusionmodelscustom_tpu.parallel import global_batch_from_local

    mesh = make_mesh(8, 1)
    local = {"img": np.ones((8, 4, 4, 1), np.float32)}
    out = global_batch_from_local(mesh, local)
    assert out["img"].shape == (8, 4, 4, 1)
    assert "data" in str(out["img"].sharding.spec)


def test_spatial_partitioning_forward():
    # shard H over the model axis: XLA inserts conv halo exchange
    from diffusionmodelscustom_tpu.parallel import spatial_batch_sharding

    mesh = make_mesh(4, 2)
    model = ConditionalUNet(
        out_channels=1, base_channels=8, time_dim=16, n_heads=2,
        attention_levels=(), attention_levels_up=(),
    )
    x = jax.random.normal(jax.random.key(0), (4, 32, 32, 1))
    t = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.key(1), x, t)

    ref = model.apply(params, x, t)
    xs = jax.device_put(x, spatial_batch_sharding(mesh))
    with mesh:
        out = jax.jit(lambda p, xx: model.apply(p, xx, t))(params, xs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4
    )


def test_sharded_sampling_matches_single_device():
    # inference-side SPMD: the fused sampling scan under a data-sharded
    # mesh must produce bitwise-identical samples to the unsharded run
    # (threefry partitionable RNG + pure collectives-free per-sample math)
    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.sampling import ancestral_sample

    model = ConditionalUNet(
        out_channels=1, base_channels=8, time_dim=16, n_heads=2,
        attention_levels=(), attention_levels_up=(),
    )
    diff = GaussianDiffusion.create(n_timesteps=20)
    x0 = jnp.zeros((8, 16, 16, 1))
    params = model.init(jax.random.key(0), x0, jnp.zeros((8,), jnp.int32))

    def denoise(x, t):
        return model.apply(params, x, t)

    fn = lambda key: ancestral_sample(denoise, diff, key, (8, 16, 16, 1))
    ref = jax.jit(fn)(jax.random.key(7))

    mesh = make_mesh(8, 1)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")
    )
    with mesh:
        out = jax.jit(fn, out_shardings=sharding)(jax.random.key(7))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def _tiny_cascade(text_dim=32):
    """Two-stage text-conditional Imagen cascade at toy dims (mirrors
    tests/test_imagen.py fixtures)."""
    from diffusionmodelscustom_tpu.models.imagen import Imagen, ImagenUNet

    def unet(lowres):
        return ImagenUNet(
            dim=16,
            dim_mults=(1, 2),
            channels=3,
            text_embed_dim=text_dim,
            num_resnet_blocks=1,
            layer_attns=(False, True),
            layer_cross_attns=(False, True),
            attn_heads=2,
            lowres_cond=lowres,
            learned_sinu_dim=8,
        )

    return Imagen(
        unets=[unet(False), unet(True)],
        image_sizes=(8, 16),
        channels=3,
        timesteps=10,
        cond_drop_prob=0.1,
    )


def _cascade_batch(b=8, text_dim=32):
    return (
        jax.random.uniform(jax.random.key(0), (b, 16, 16, 3)),
        jax.random.normal(jax.random.key(9), (b, 4, text_dim)),
        jnp.ones((b, 4), bool),
    )


def test_sharded_cascade_train_step_matches_single_device():
    """The reference's only working distributed path was the ImagenTrainer
    Accelerate DDP wrap (CascadedDDPM/trainer.py:352-358, gradient
    allreduce :1060-1066). Here the mesh-constructed trainer must produce
    the same losses/params as the single-device one on both cascade
    stages."""
    from diffusionmodelscustom_tpu.train.imagen_trainer import (
        ImagenTrainer,
        ImagenTrainerConfig,
    )

    images, te, tm = _cascade_batch()
    cfg = ImagenTrainerConfig(use_ema=True)

    single = ImagenTrainer(_tiny_cascade(), cfg, text_embed_dim=32)
    mesh = make_mesh(8, 1)
    sharded = ImagenTrainer(_tiny_cascade(), cfg, text_embed_dim=32, mesh=mesh)

    for unet_number in (1, 2):
        rng = jax.random.key(unet_number)
        l_single = single.train_step(
            unet_number, images, text_embeds=te, text_mask=tm, rng=rng
        )
        l_sharded = sharded.train_step(
            unet_number, images, text_embeds=te, text_mask=tm, rng=rng
        )
        np.testing.assert_allclose(l_single, l_sharded, rtol=1e-5)
        p1 = jax.tree_util.tree_leaves(single.states[unet_number - 1].params)[0]
        p2 = jax.tree_util.tree_leaves(sharded.states[unet_number - 1].params)[0]
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-6
        )


def test_fsdp_cascade_train_and_sample():
    """data x model mesh: cascade params fsdp-sharded, one step runs, and
    the jitted EMA cascade sampling walk executes with the output sharded
    on ``data``."""
    from diffusionmodelscustom_tpu.train.imagen_trainer import (
        ImagenTrainer,
        ImagenTrainerConfig,
    )

    images, te, tm = _cascade_batch()
    mesh = make_mesh(4, 2)
    trainer = ImagenTrainer(
        _tiny_cascade(),
        ImagenTrainerConfig(use_ema=True),
        text_embed_dim=32,
        mesh=mesh,
        fsdp_min_size=0,
    )
    for unet_number in (1, 2):
        loss = trainer.train_step(
            unet_number, images, text_embeds=te, text_mask=tm,
            rng=jax.random.key(5),
        )
        assert np.isfinite(loss)
    specs = [
        str(x.sharding.spec)
        for x in jax.tree_util.tree_leaves(trainer.states[0].params)
    ]
    assert any("model" in s for s in specs), "no fsdp-sharded param leaf"

    te4, tm4 = te[:4], tm[:4]
    out = trainer.sample(
        jax.random.key(6), batch_size=4, text_embeds=te4, text_mask=tm4
    )
    assert out.shape == (4, 16, 16, 3)
    assert "data" in str(out.sharding.spec)
    assert np.isfinite(np.asarray(out)).all()


def test_spatial_sharded_sampling_matches_single_device():
    """Full-domain generation story: the ENTIRE fused sampling scan runs
    with the image height sharded over the model axis (XLA inserting conv
    halo exchanges every step) and must match the unsharded samples —
    this is how a 589x789 full-DANRA-domain field that exceeds one chip's
    memory gets generated (SURVEY.md section 5.7)."""
    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.sampling import ancestral_sample

    model = ConditionalUNet(
        out_channels=1, base_channels=8, time_dim=16, n_heads=2,
        attention_levels=(), attention_levels_up=(),
    )
    diff = GaussianDiffusion.create(n_timesteps=12)
    x0 = jnp.zeros((2, 32, 32, 1))
    params = model.init(jax.random.key(0), x0, jnp.zeros((2,), jnp.int32))

    def denoise(x, t):
        return model.apply(params, x, t)

    fn = lambda key: ancestral_sample(denoise, diff, key, (2, 32, 32, 1))
    ref = jax.jit(fn)(jax.random.key(3))

    from diffusionmodelscustom_tpu.parallel import spatial_batch_sharding

    mesh = make_mesh(2, 4)  # H split 4-ways, batch 2-ways
    with mesh:
        out = jax.jit(fn, out_shardings=spatial_batch_sharding(mesh))(
            jax.random.key(3)
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
