"""End-to-end trainer tests: loss goes down on a tiny synthetic problem,
EMA tracks, CFG dropout runs, early stopping triggers."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodelscustom_tpu.core.ddpm import GaussianDiffusion
from diffusionmodelscustom_tpu.models import ConditionalUNet
from diffusionmodelscustom_tpu.train import Trainer, TrainerConfig


def tiny_model(**kw):
    defaults = dict(
        out_channels=1,
        base_channels=8,
        time_dim=16,
        n_heads=2,
        attention_levels=(2,),
        attention_levels_up=(2,),
    )
    defaults.update(kw)
    return ConditionalUNet(**defaults)


def make_batch(rng, b=4, size=16):
    x = jax.random.normal(rng, (b, size, size, 1))
    return {"img": x}


def test_train_step_reduces_loss():
    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=50)
    trainer = Trainer(model, diff, TrainerConfig(learning_rate=1e-3, ema=True))
    rng = jax.random.key(0)
    batch = make_batch(jax.random.key(1))
    state = trainer.init_state(rng, batch)

    first_loss = None
    losses = []
    for i in range(30):
        state, metrics = trainer.train_step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    # loss should drop substantially on a single repeated batch
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_ema_params_track():
    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=20)
    trainer = Trainer(model, diff, TrainerConfig(ema=True, ema_decay=0.5))
    batch = make_batch(jax.random.key(2))
    state = trainer.init_state(jax.random.key(0), batch)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    for i in range(3):
        state, _ = trainer.train_step(state, batch, jax.random.fold_in(jax.random.key(3), i))
    ema_leaf = jax.tree_util.tree_leaves(state.ema_params)[0]
    p_leaf = jax.tree_util.tree_leaves(state.params)[0]
    # EMA moved from init but is not equal to current params
    assert not np.allclose(np.asarray(ema_leaf), np.asarray(p0))
    assert not np.allclose(np.asarray(ema_leaf), np.asarray(p_leaf))


def test_sdf_weighted_training():
    model = tiny_model(cond_on_lsm=True, cond_on_topo=True, cond_img_channels=1)
    diff = GaussianDiffusion.create(n_timesteps=20)
    trainer = Trainer(model, diff, TrainerConfig(loss="sdfweighted"))
    rng = jax.random.key(0)
    b, size = 2, 16
    batch = {
        "img": jax.random.normal(rng, (b, size, size, 1)),
        "classifier": jnp.array([0, 1]),
        "img_cond": jax.random.normal(rng, (b, size // 4, size // 4, 1)),
        "lsm": jnp.ones((b, size, size, 1)),
        "topo": jnp.zeros((b, size, size, 1)),
        "sdf": jax.random.normal(rng, (b, size, size, 1)),
    }
    # model config needs num_classes for the label embed
    model = tiny_model(
        cond_on_lsm=True, cond_on_topo=True, cond_img_channels=1, num_classes=4
    )
    trainer = Trainer(
        model,
        diff,
        TrainerConfig(loss="sdfweighted", cfg_dropout_prob=0.2, num_classes=4),
    )
    state = trainer.init_state(rng, batch)
    state, metrics = trainer.train_step(state, batch, jax.random.key(5))
    assert np.isfinite(float(metrics["loss"]))


def test_fit_early_stopping():
    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=20)
    trainer = Trainer(
        model, diff, TrainerConfig(early_stopping_patience=1, learning_rate=0.0)
    )
    batch = make_batch(jax.random.key(1))
    state = trainer.init_state(jax.random.key(0), batch)

    epochs_seen = []
    state, history = trainer.fit(
        state,
        train_loader=lambda: [batch],
        valid_loader=lambda: [batch],
        epochs=10,
        log_fn=lambda e, tl, vl: epochs_seen.append(e),
    )
    # lr=0 -> no improvement after the first epoch -> stops early
    assert len(history["train_loss"]) < 10


def test_grad_accumulation():
    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=20)
    trainer = Trainer(model, diff, TrainerConfig(grad_accum_steps=2))
    batch = make_batch(jax.random.key(1))
    state = trainer.init_state(jax.random.key(0), batch)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = trainer.train_step(state, batch, jax.random.key(2))
    # after 1 of 2 accumulation steps params must be unchanged
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = trainer.train_step(state, batch, jax.random.key(3))
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))


def test_hybrid_loss_training():
    # hybrid selectable end-to-end: T forwards on the same x_t, final term
    # weight 1, earlier terms alpha (training_DANRA_conditional.py:18-31)
    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=6)
    trainer = Trainer(
        model, diff,
        TrainerConfig(loss="hybrid", hybrid_alpha=0.5, learning_rate=1e-3, ema=False),
    )
    batch = make_batch(jax.random.key(1))
    state = trainer.init_state(jax.random.key(0), batch)
    losses = []
    for i in range(10):
        state, m = trainer.train_step(state, batch, jax.random.fold_in(jax.random.key(2), i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # eval path works too
    v = trainer.eval_step(state, batch, jax.random.key(3))
    assert np.isfinite(float(v))


def test_hybrid_loss_matches_manual_stack():
    # the scan accumulation equals the explicit stacked-T computation
    from diffusionmodelscustom_tpu.core.losses import simple_loss

    model = tiny_model()
    T = 4
    diff = GaussianDiffusion.create(n_timesteps=T)
    trainer = Trainer(model, diff, TrainerConfig(loss="hybrid", hybrid_alpha=0.5, ema=False))
    batch = make_batch(jax.random.key(1))
    state = trainer.init_state(jax.random.key(0), batch)
    x_t = jax.random.normal(jax.random.key(5), batch["img"].shape)
    rng = jax.random.key(7)
    got = float(trainer._hybrid_loss(state.params, state.batch_stats, batch, x_t, rng))

    keys = jax.random.split(rng, T)
    want = 0.0
    for k in range(T):
        pred, _ = trainer._forward(
            state.params, state.batch_stats, batch, x_t,
            jnp.full((x_t.shape[0],), k), train=False,
        )
        noise_k = jax.random.normal(keys[k], x_t.shape, jnp.float32)
        w = 1.0 if k == T - 1 else 0.5
        want += w * float(simple_loss(pred, noise_k))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_plateau_scheduler_reduces_lr():
    # constant loss (zero-gradient direction won't happen, so use a batch
    # the model can't fit and a tiny patience): the plateau scale must drop
    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=10)
    trainer = Trainer(
        model, diff,
        TrainerConfig(
            learning_rate=1e-8,  # effectively frozen -> loss plateaus
            lr_scheduler="plateau",
            plateau_patience=2,
            plateau_factor=0.5,
            plateau_accumulation=1,
            ema=False,
        ),
    )
    batch = make_batch(jax.random.key(1))
    state = trainer.init_state(jax.random.key(0), batch)
    assert trainer.lr_scale(state) == 1.0
    for i in range(12):
        # identical rng -> identical loss every step -> guaranteed plateau
        state, m = trainer.train_step(state, batch, jax.random.key(9))
    assert trainer.lr_scale(state) < 1.0


def test_warmup_cosine_requires_total_steps():
    import pytest

    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=10)
    with pytest.raises(ValueError, match="total_steps"):
        Trainer(model, diff, TrainerConfig(lr_scheduler="warmup_cosine"))
    # and with total_steps it trains
    trainer = Trainer(
        model, diff,
        TrainerConfig(lr_scheduler="warmup_cosine", total_steps=100,
                      warmup_steps=10, ema=False),
    )
    batch = make_batch(jax.random.key(1))
    state = trainer.init_state(jax.random.key(0), batch)
    state, m = trainer.train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


def test_unknown_scheduler_rejected():
    import pytest

    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=10)
    with pytest.raises(ValueError, match="lr_scheduler"):
        Trainer(model, diff, TrainerConfig(lr_scheduler="bogus"))


def test_unknown_loss_rejected_eagerly():
    import pytest

    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=10)
    # at construction, not at the first jitted step
    with pytest.raises(ValueError, match="unknown loss"):
        Trainer(model, diff, TrainerConfig(loss="bogus"))


def test_train_scan_matches_sequential_steps():
    """K scanned updates == K sequential train_step calls on the same
    gathered batches with the same per-step keys (the remote-dispatch
    batching path, mirroring ProgressiveDistiller.distill_scan)."""
    model = tiny_model()
    diff = GaussianDiffusion.create(n_timesteps=50)
    cfg = TrainerConfig(learning_rate=1e-3, ema=True)
    rng = jax.random.key(0)
    data = {"img": jax.random.normal(jax.random.key(1), (10, 16, 16, 1))}
    K, B = 3, 4
    idx = jnp.asarray(
        np.stack([[0, 3, 7, 9], [1, 2, 4, 5], [6, 8, 0, 2]]), jnp.int32
    )
    rngs = jax.vmap(lambda s: jax.random.fold_in(rng, s))(jnp.arange(K))

    t1 = Trainer(model, diff, cfg)
    s_seq = t1.init_state(jax.random.key(2), {"img": data["img"][:B]})
    for k in range(K):
        batch = {"img": data["img"][idx[k]]}
        s_seq, m_seq = t1.train_step(s_seq, batch, rngs[k])

    t2 = Trainer(model, diff, cfg)
    s_scan = t2.init_state(jax.random.key(2), {"img": data["img"][:B]})
    s_scan, m_scan = t2.train_scan(s_scan, data, idx, rngs)

    assert int(s_scan.step) == K
    np.testing.assert_allclose(
        float(m_scan["loss"]), float(m_seq["loss"]), rtol=1e-5
    )
    # the loss check above pins batch/key equivalence tightly; param
    # tolerances are loose because Adam amplifies reassociated-float
    # grad noise near zero-magnitude elements to ~lr-scale over K steps
    # (measured max 1.5e-4) — a wrong rng/index stream would give O(1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4
        ),
        s_seq.params, s_scan.params,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4
        ),
        s_seq.ema_params, s_scan.ema_params,
    )
