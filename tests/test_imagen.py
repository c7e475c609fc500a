"""Imagen cascade tests: UNet shapes, CFG null conditioning, cascade
training losses and two-stage sampling, EDM variant, trainer, T5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodelscustom_tpu.core import EDMConfig
from diffusionmodelscustom_tpu.models.imagen import (
    ElucidatedImagen,
    Imagen,
    ImagenUNet,
    NullUnet,
    t5_encode_text,
)
from diffusionmodelscustom_tpu.train.imagen_trainer import (
    ImagenTrainer,
    ImagenTrainerConfig,
)

TEXT_DIM = 32


def tiny_unet(lowres=False):
    return ImagenUNet(
        dim=16,
        dim_mults=(1, 2),
        channels=3,
        text_embed_dim=TEXT_DIM,
        num_resnet_blocks=1,
        layer_attns=(False, True),
        layer_cross_attns=(False, True),
        attn_heads=2,
        lowres_cond=lowres,
        learned_sinu_dim=8,
    )


def text_batch(b=2, l=4):
    rng = jax.random.key(9)
    return (
        jax.random.normal(rng, (b, l, TEXT_DIM)),
        jnp.ones((b, l), bool),
    )


class TestImagenUNet:
    def test_forward_shapes(self):
        unet = tiny_unet()
        x = jnp.zeros((2, 16, 16, 3))
        nc = jnp.zeros((2,))
        te, tm = text_batch()
        params = unet.init(jax.random.key(0), x, nc, text_embeds=te, text_mask=tm)
        out = unet.apply(params, x, nc, text_embeds=te, text_mask=tm)
        assert out.shape == x.shape

    def test_cond_drop_changes_output(self):
        unet = tiny_unet()
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
        nc = jnp.zeros((2,))
        te, tm = text_batch()
        params = unet.init(jax.random.key(0), x, nc, text_embeds=te, text_mask=tm)
        cond = unet.apply(params, x, nc, text_embeds=te, text_mask=tm)
        uncond = unet.apply(
            params, x, nc, text_embeds=te, text_mask=tm,
            cond_drop_mask=jnp.ones((2,), bool),
        )
        assert not np.allclose(np.asarray(cond), np.asarray(uncond))

    def test_lowres_stage(self):
        unet = tiny_unet(lowres=True)
        x = jnp.zeros((1, 16, 16, 3))
        nc = jnp.zeros((1,))
        lr = jnp.zeros((1, 8, 8, 3))  # gets resized internally
        params = unet.init(
            jax.random.key(0), x, nc, lowres_cond_img=lr,
            lowres_noise_cond=jnp.zeros((1,)),
        )
        out = unet.apply(
            params, x, nc, lowres_cond_img=lr, lowres_noise_cond=jnp.zeros((1,))
        )
        assert out.shape == x.shape


class TestCascade:
    def make_cascade(self, elucidated=False):
        unets = [tiny_unet(), tiny_unet(lowres=True)]
        kw = dict(
            unets=unets,
            image_sizes=(8, 16),
            channels=3,
            timesteps=20,
            cond_drop_prob=0.1,
        )
        if elucidated:
            return ElucidatedImagen(
                edm=EDMConfig(num_sample_steps=6), **kw
            )
        return Imagen(**kw)

    def test_p_losses_both_stages(self):
        cascade = self.make_cascade()
        images = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
        te, tm = text_batch()
        for idx in range(2):
            params = cascade.init_unet_params(
                idx, jax.random.key(idx), text_embed_dim=TEXT_DIM
            )
            loss = cascade.p_losses(
                idx, params, images, jax.random.key(3),
                text_embeds=te, text_mask=tm,
            )
            assert np.isfinite(float(loss)), f"stage {idx}"

    def test_two_stage_sampling(self):
        cascade = self.make_cascade()
        te, tm = text_batch()
        params = [
            cascade.init_unet_params(i, jax.random.key(i), text_embed_dim=TEXT_DIM)
            for i in range(2)
        ]
        out = cascade.sample(
            params, jax.random.key(5), batch_size=2,
            text_embeds=te, text_mask=tm, cond_scale=2.0,
        )
        assert out.shape == (2, 16, 16, 3)
        x = np.asarray(out)
        assert np.isfinite(x).all()
        assert x.min() >= 0.0 and x.max() <= 1.0  # unnormalized to [0,1]

    def test_elucidated_loss_and_sample(self):
        cascade = self.make_cascade(elucidated=True)
        images = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
        te, tm = text_batch()
        params = [
            cascade.init_unet_params(i, jax.random.key(i), text_embed_dim=TEXT_DIM)
            for i in range(2)
        ]
        loss = cascade.p_losses(
            0, params[0], images, jax.random.key(1), text_embeds=te, text_mask=tm
        )
        assert np.isfinite(float(loss))
        out = cascade.sample(
            params, jax.random.key(2), batch_size=1, text_embeds=te[:1],
            text_mask=tm[:1],
        )
        assert out.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_v_objective(self):
        unets = [tiny_unet()]
        cascade = Imagen(
            unets=unets, image_sizes=(8,), channels=3, timesteps=10,
            pred_objectives="v",
        )
        params = cascade.init_unet_params(0, jax.random.key(0), text_embed_dim=TEXT_DIM)
        te, tm = text_batch()
        loss = cascade.p_losses(
            0, params, jax.random.uniform(jax.random.key(1), (2, 8, 8, 3)),
            jax.random.key(2), text_embeds=te, text_mask=tm,
        )
        assert np.isfinite(float(loss))

    def test_null_unet_passthrough(self):
        null = NullUnet()
        x = jnp.ones((1, 4, 4, 3))
        assert null.apply(null.init(), x) is x


class TestImagenTrainer:
    def test_train_steps_reduce_loss(self):
        cascade = Imagen(
            unets=[tiny_unet()], image_sizes=(8,), channels=3, timesteps=20,
            cond_drop_prob=0.0,
        )
        trainer = ImagenTrainer(
            cascade,
            ImagenTrainerConfig(learning_rate=2e-3, use_ema=True),
            text_embed_dim=TEXT_DIM,
        )
        images = jax.random.uniform(jax.random.key(0), (4, 8, 8, 3))
        te, tm = text_batch(4)
        losses = [
            trainer.train_step(
                1, images, text_embeds=te, text_mask=tm,
                rng=jax.random.fold_in(jax.random.key(1), i),
            )
            for i in range(15)
        ]
        assert trainer.num_steps_taken(1) == 15
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    def test_trainer_sample(self):
        cascade = Imagen(
            unets=[tiny_unet()], image_sizes=(8,), channels=3, timesteps=10,
        )
        trainer = ImagenTrainer(cascade, text_embed_dim=TEXT_DIM)
        te, tm = text_batch(1)
        out = trainer.sample(
            jax.random.key(0), batch_size=1, text_embeds=te, text_mask=tm
        )
        assert out.shape == (1, 8, 8, 3)


class TestT5:
    def test_fallback_encoding_deterministic(self):
        e1, m1 = t5_encode_text(["a danish temperature field", "hello"])
        e2, m2 = t5_encode_text(["a danish temperature field", "hello"])
        np.testing.assert_array_equal(e1, e2)
        assert e1.shape[0] == 2 and e1.shape[2] == 768
        assert m1[0, :4].all() and not m1[0, 4:].any()  # 4 tokens
        # masked positions are zeroed
        assert np.abs(e1[0, 4:]).max() == 0.0


def test_elucidated_inpainting_sample():
    # EDM inpainting through the full cascade sample path (the round-1
    # assert at models/imagen/cascade.py is gone): masked pixels of the
    # known image survive to the output, everything is finite.
    unets = [
        ImagenUNet(
            dim=16, dim_mults=(1, 2), channels=3, text_embed_dim=TEXT_DIM,
            num_resnet_blocks=1, layer_attns=(False, True),
            layer_cross_attns=(False, True), attn_heads=2,
            learned_sinu_dim=8,
        )
    ]
    cascade = ElucidatedImagen(
        unets=unets, image_sizes=(8,), channels=3,
        edm=EDMConfig(num_sample_steps=4),
    )
    te, tm = text_batch()
    params = [cascade.init_unet_params(0, jax.random.key(0), text_embed_dim=TEXT_DIM)]
    known = jnp.ones((2, 8, 8, 3)) * 0.75  # in [0,1] image space
    mask = jnp.zeros((2, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    out = cascade.sample(
        params, jax.random.key(1), batch_size=2,
        text_embeds=te, text_mask=tm,
        inpaint_images=known, inpaint_masks=mask, inpaint_resample_times=2,
    )
    out = np.asarray(out)
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, 2:6, 2:6], 0.75, atol=1e-5)


class TestImagenBreadth:
    """Round-2 breadth: cosine-sim attention, linear attention variants,
    UpsampleCombiner, scaled skips, cast_model_parameters."""

    def test_full_knob_unet_forward(self):
        unet = ImagenUNet(
            dim=16, dim_mults=(1, 2), channels=3, text_embed_dim=TEXT_DIM,
            num_resnet_blocks=1,
            layer_attns=(False, True),
            layer_cross_attns=(False, True),
            use_linear_attn=(True, False),      # linear attn at level 0
            use_linear_cross_attn=(True, False),  # linear cross at level 0
            cosine_sim_attn=True,
            scale_skip_connection=True,
            combine_upsample_fmaps=True,
            attn_heads=2, learned_sinu_dim=8,
        )
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
        nc = jnp.zeros((2,))
        te, tm = text_batch()
        params = unet.init(jax.random.key(1), x, nc, text_embeds=te, text_mask=tm)
        out = unet.apply(params, x, nc, text_embeds=te, text_mask=tm)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        # the knob-specific params actually exist
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = "/".join(str(p) for p, _ in flat)
        assert "linattn" in names
        assert "upsample_combiner" in names
        assert "q_scale" in names  # cosine-sim scales

    def test_linear_attention_shapes(self):
        from diffusionmodelscustom_tpu.models.imagen import (
            CosineSimAttention, LinearAttention, LinearCrossAttention,
        )

        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
        m = LinearAttention(dim_head=8, heads=2)
        p = m.init(jax.random.key(1), x)
        assert m.apply(p, x).shape == x.shape

        tokens = x.reshape(2, 64, 16)
        ctx = jax.random.normal(jax.random.key(2), (2, 5, 12))
        mask = jnp.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], bool)
        mc = LinearCrossAttention(dim_head=8, heads=2)
        pc = mc.init(jax.random.key(3), tokens, ctx, mask)
        assert mc.apply(pc, tokens, ctx, mask).shape == tokens.shape

        ma = CosineSimAttention(dim_head=8, heads=2, context_dim=12)
        pa = ma.init(jax.random.key(4), tokens, ctx)
        out = ma.apply(pa, tokens, ctx)
        assert out.shape == tokens.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_linear_cross_attention_mask_ignores_padding(self):
        from diffusionmodelscustom_tpu.models.imagen import LinearCrossAttention

        tokens = jax.random.normal(jax.random.key(0), (1, 16, 8))
        ctx = jax.random.normal(jax.random.key(1), (1, 6, 8))
        mask = jnp.array([[1, 1, 1, 0, 0, 0]], bool)
        m = LinearCrossAttention(dim_head=8, heads=1)
        p = m.init(jax.random.key(2), tokens, ctx, mask)
        base = m.apply(p, tokens, ctx, mask)
        # changing MASKED positions must not change the output
        ctx2 = ctx.at[:, 3:].set(jax.random.normal(jax.random.key(3), (1, 3, 8)))
        out2 = m.apply(p, tokens, ctx2, mask)
        np.testing.assert_allclose(np.asarray(base), np.asarray(out2), atol=1e-5)

    def test_cast_model_parameters(self):
        unet = tiny_unet()
        same = unet.cast_model_parameters(
            lowres_cond=False, text_embed_dim=TEXT_DIM, channels=3,
            channels_out=None, cond_on_text=True,
        )
        assert same is unet
        recast = unet.cast_model_parameters(
            lowres_cond=True, text_embed_dim=TEXT_DIM, channels=3,
            channels_out=3, cond_on_text=True,
        )
        assert recast is not unet and recast.lowres_cond
        nu = NullUnet()
        assert nu.cast_model_parameters() is nu

    def test_channels_out_and_cond_on_text_off(self):
        unet = ImagenUNet(
            dim=16, dim_mults=(1, 2), channels=3, channels_out=6,
            cond_on_text=False, text_embed_dim=TEXT_DIM,
            num_resnet_blocks=1, layer_attns=(False, True),
            layer_cross_attns=(False, False), attn_heads=2, learned_sinu_dim=8,
        )
        x = jnp.zeros((1, 16, 16, 3))
        nc = jnp.zeros((1,))
        te, tm = text_batch(b=1)
        params = unet.init(jax.random.key(0), x, nc, text_embeds=te, text_mask=tm)
        out = unet.apply(params, x, nc, text_embeds=te, text_mask=tm)
        assert out.shape == (1, 16, 16, 6)


class TestImagenTrainerPersistence:
    """Round-2 trainer tail: checkpoint_every rotation, managed
    dataloaders, only_train_unet lock, kill-and-resume."""

    def _trainer(self, tmp_path=None, **cfg_kw):
        unets = [tiny_unet()]
        cascade = Imagen(
            unets=unets, image_sizes=(8,), channels=3, timesteps=10,
        )
        cfg = ImagenTrainerConfig(
            use_ema=True,
            checkpoint_path=str(tmp_path) if tmp_path else None,
            **cfg_kw,
        )
        return ImagenTrainer(cascade, cfg, text_embed_dim=TEXT_DIM)

    def _batches(self, n=4):
        te, tm = text_batch()
        return [
            {
                "images": jax.random.uniform(jax.random.key(i), (2, 8, 8, 3)),
                "text_embeds": te,
                "text_mask": tm,
            }
            for i in range(n)
        ]

    def test_checkpoint_every_and_rotation(self, tmp_path):
        trainer = self._trainer(
            tmp_path, checkpoint_every=1, max_checkpoints_keep=2
        )
        trainer.add_train_dataloader(self._batches())
        for _ in range(5):
            trainer.train_step(1, rng=jax.random.key(3))
        ckpts = sorted((tmp_path).glob("ckpt_*"))
        assert len(ckpts) == 2  # rotated down to max_checkpoints_keep
        steps = sorted(int(p.name.split("_")[1]) for p in ckpts)
        assert steps == [4, 5]

    def test_kill_and_resume_exact(self, tmp_path):
        trainer = self._trainer(tmp_path, checkpoint_every=2)
        trainer.add_train_dataloader(self._batches())
        for _ in range(4):
            trainer.train_step(1, rng=jax.random.key(3))
        p_before = jax.tree_util.tree_leaves(trainer.states[0].params)[0]

        # simulate a crash: a brand-new trainer on the same folder resumes
        resumed = self._trainer(tmp_path)
        assert resumed.num_steps_taken(1) == 4
        p_after = jax.tree_util.tree_leaves(resumed.states[0].params)[0]
        np.testing.assert_allclose(
            np.asarray(p_before), np.asarray(p_after), rtol=1e-6
        )
        # EMA state survived too (not promoted on resume)
        assert resumed.states[0].ema_params is not None

    def test_fsspec_checkpoint_rotation_and_resume(self):
        """Checkpoint folders on a non-local fsspec filesystem
        (memory://): rotation + kill-and-resume — the reference accepted
        any fsspec URL for its checkpoint folder
        (CascadedDDPM/trainer.py:329-336)."""
        import uuid

        url = f"memory://ckpts/{uuid.uuid4().hex}"
        trainer = self._trainer(
            url, checkpoint_every=1, max_checkpoints_keep=2
        )
        trainer.add_train_dataloader(self._batches())
        for _ in range(5):
            trainer.train_step(1, rng=jax.random.key(3))
        from diffusionmodelscustom_tpu.utils.checkpoint import FolderFS

        ckpts = FolderFS(url).list_ckpts()
        assert [s for s, _ in ckpts] == [4, 5]  # rotated down to 2

        p_before = jax.tree_util.tree_leaves(trainer.states[0].params)[0]
        resumed = self._trainer(url)  # fresh trainer on the same URL
        assert resumed.num_steps_taken(1) == 5
        p_after = jax.tree_util.tree_leaves(resumed.states[0].params)[0]
        np.testing.assert_allclose(
            np.asarray(p_before), np.asarray(p_after), rtol=1e-6
        )
        assert resumed.states[0].ema_params is not None

    def test_only_train_unet_lock(self):
        unets = [tiny_unet(), tiny_unet(lowres=True)]
        cascade = Imagen(unets=unets, image_sizes=(8, 16), channels=3, timesteps=10)
        trainer = ImagenTrainer(
            cascade, ImagenTrainerConfig(only_train_unet=1),
            text_embed_dim=TEXT_DIM,
        )
        te, tm = text_batch()
        images = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
        with pytest.raises(ValueError, match="only_train_unet"):
            trainer.train_step(2, images, text_embeds=te, text_mask=tm)

    def test_managed_dataloader_cycles(self):
        trainer = self._trainer()
        batches = self._batches(n=2)
        trainer.add_train_dataloader(batches)
        losses = [trainer.train_step(1, rng=jax.random.key(4)) for _ in range(5)]
        assert all(np.isfinite(losses))
        with pytest.raises(ValueError, match="dataloader"):
            trainer.valid_step(1)


def test_t5_flax_matches_torch_on_tiny_model(tmp_path):
    # The flax wiring must reproduce the torch encoder exactly. No cached
    # google/t5 weights exist in the offline image, so build a tiny
    # randomly-initialized T5, save it, and load it through BOTH backends.
    import torch
    from transformers import FlaxT5EncoderModel, T5Config, T5EncoderModel

    from diffusionmodelscustom_tpu.models.imagen.t5 import encode_tokenized_flax

    cfg = T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu", tie_word_embeddings=False,
    )
    torch_model = T5EncoderModel(cfg).eval()
    torch_model.save_pretrained(tmp_path / "tiny_t5")
    flax_model = FlaxT5EncoderModel.from_pretrained(
        tmp_path / "tiny_t5", from_pt=True
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 10)).astype("int32")
    mask = np.ones((2, 10), "int32")
    mask[1, 6:] = 0

    got = encode_tokenized_flax(flax_model, ids, mask)
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    want = want * mask[..., None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_t5_fallback_warns_once():
    import warnings as _w

    from diffusionmodelscustom_tpu.models.imagen import t5 as t5mod

    if not t5mod.is_fallback():
        pytest.skip("real T5 weights are cached; fallback not in use")
    t5mod._warned_fallback = False
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        t5mod.t5_encode_text(["hello world"])
        t5mod.t5_encode_text(["again"])
    msgs = [str(r.message) for r in rec if "NON-SEMANTIC" in str(r.message)]
    assert len(msgs) == 1


def test_random_crop_sr_training():
    # random-crop SR training (imagen_pytorch.py:3345): the SR stage
    # trains on aligned crops; loss is finite and gradients flow
    unets = [tiny_unet(), tiny_unet(lowres=True)]
    cascade = Imagen(
        unets=unets, image_sizes=(8, 16), channels=3, timesteps=10,
        random_crop_sizes=(None, 8),
    )
    te, tm = text_batch()
    images = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    params = cascade.init_unet_params(1, jax.random.key(1), text_embed_dim=TEXT_DIM)
    loss = cascade.p_losses(
        1, params, images, jax.random.key(2), text_embeds=te, text_mask=tm
    )
    assert np.isfinite(float(loss))
    # gradient flows through the cropped path
    g = jax.grad(
        lambda p: cascade.p_losses(
            1, p, images, jax.random.key(2), text_embeds=te, text_mask=tm
        )
    )(params)
    gn = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), g, jnp.zeros(())
    ))
    assert np.isfinite(gn) and gn > 0


def test_cross_embed_downsample_knob():
    unet = ImagenUNet(
        dim=16, dim_mults=(1, 2), channels=3, text_embed_dim=TEXT_DIM,
        num_resnet_blocks=1, layer_attns=(False, True),
        layer_cross_attns=(False, False), attn_heads=2, learned_sinu_dim=8,
        use_cross_embed=True, init_cross_embed_kernel_sizes=(3, 7),
        cross_embed_downsample=True,
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = unet.init(jax.random.key(0), x, jnp.zeros((1,)))
    out = unet.apply(params, x, jnp.zeros((1,)))
    assert out.shape == x.shape
    modules = set(params["params"].keys())
    assert "init_cross_embed" in modules
    assert "conv_k2" in params["params"]["down_0_downsample"]


class TestCascadeLossTypesAndStartImage:
    def _cascade(self, loss_type="l2"):
        unets = [tiny_unet(), tiny_unet(lowres=True)]
        return Imagen(
            unets=unets, image_sizes=(8, 16), channels=3, timesteps=20,
            cond_drop_prob=0.0, loss_type=loss_type,
        )

    def test_huber_differs_from_l2_and_is_applied(self):
        """loss_type='huber' must actually clamp large residuals — an
        earlier p_losses special-cased only 'l1' and silently trained
        huber configs with plain L2."""
        losses = {}
        for lt in ("l2", "huber", "l1"):
            cascade = self._cascade(lt)
            te, tm = text_batch()
            params = cascade.init_unet_params(
                0, jax.random.key(0), text_embed_dim=TEXT_DIM
            )
            images = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
            losses[lt] = float(
                cascade.p_losses(
                    0, params, images, jax.random.key(2),
                    text_embeds=te, text_mask=tm,
                )
            )
        assert losses["huber"] != losses["l2"]
        assert losses["huber"] != losses["l1"]
        # huber <= l2 pointwise for the same residuals (delta=1)
        assert losses["huber"] <= losses["l2"] + 1e-6

    def test_unknown_loss_type_rejected_eagerly(self):
        with pytest.raises(ValueError, match="unknown loss_type"):
            self._cascade("nope")

    def test_start_image_normalized_on_entry(self):
        """A [0,1] start image for SR-only sampling must be normalized to
        the internal [-1,1] stage space (imagen_pytorch.py:4220)."""
        cascade = self._cascade()
        te, tm = text_batch()
        params = [
            cascade.init_unet_params(
                i, jax.random.key(i), text_embed_dim=TEXT_DIM
            )
            for i in range(2)
        ]
        start01 = jax.random.uniform(jax.random.key(7), (2, 8, 8, 3))
        out = cascade.sample(
            params, jax.random.key(5), batch_size=2,
            text_embeds=te, text_mask=tm,
            start_image_or_video=start01, start_at_unet_number=2,
        )
        x = np.asarray(out)
        assert x.shape == (2, 16, 16, 3)
        assert np.isfinite(x).all()
        assert x.min() >= 0.0 and x.max() <= 1.0
        # the SR stage must SEE the normalized start image: feeding the
        # pre-normalized version of the same image must give the same
        # output as the [0,1] original would if the entry normalization
        # exists (i.e. sample(normalize(x)) != sample(x) unless the fix
        # normalizes exactly once)
        out2 = cascade.sample(
            params, jax.random.key(5), batch_size=2,
            text_embeds=te, text_mask=tm,
            start_image_or_video=start01 * 0.0 + 1.0,  # all-ones image
            start_at_unet_number=2,
        )
        assert not np.allclose(x, np.asarray(out2))


class TestCondImages:
    """cond_images threading through the cascade — the reference's
    image-conditioning channel (imagen_pytorch.py:2360,2920,2963-2967:
    the unet channel-concats conditioning images resized to its input
    resolution; the cascade/trainer pass them through to every stage).
    This is what connects the Imagen cascade to DANRA-style conditioning
    (lsm/topo/coarse fields) without text."""

    def _cond_unet(self, lowres=False):
        return ImagenUNet(
            dim=16, dim_mults=(1, 2), channels=3, text_embed_dim=TEXT_DIM,
            num_resnet_blocks=1, layer_attns=(False, True),
            layer_cross_attns=(False, True), attn_heads=2,
            lowres_cond=lowres, learned_sinu_dim=8,
            cond_images_channels=2,
        )

    def _cascade(self, elucidated=False):
        kw = dict(
            unets=[self._cond_unet(), self._cond_unet(lowres=True)],
            image_sizes=(8, 16), channels=3, timesteps=10,
            cond_drop_prob=0.0,
        )
        if elucidated:
            return ElucidatedImagen(edm=EDMConfig(num_sample_steps=4), **kw)
        return Imagen(**kw)

    def test_p_losses_sees_cond_images(self):
        cascade = self._cascade()
        images = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
        cond = jax.random.normal(jax.random.key(1), (2, 16, 16, 2))
        te, tm = text_batch()
        for idx in range(2):
            params = cascade.init_unet_params(
                idx, jax.random.key(idx), text_embed_dim=TEXT_DIM
            )
            losses = [
                float(cascade.p_losses(
                    idx, params, images, jax.random.key(3),
                    text_embeds=te, text_mask=tm, cond_images=c,
                ))
                for c in (cond, cond * 3.0 + 1.0)
            ]
            assert np.isfinite(losses).all(), f"stage {idx}"
            # different conditioning images -> different loss (same rng)
            assert losses[0] != losses[1], f"stage {idx} ignored cond_images"

    def test_elucidated_p_losses_sees_cond_images(self):
        cascade = self._cascade(elucidated=True)
        images = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
        cond = jax.random.normal(jax.random.key(1), (2, 16, 16, 2))
        te, tm = text_batch()
        params = cascade.init_unet_params(
            0, jax.random.key(0), text_embed_dim=TEXT_DIM
        )
        l0 = float(cascade.p_losses(
            0, params, images, jax.random.key(3),
            text_embeds=te, text_mask=tm, cond_images=cond,
        ))
        l1 = float(cascade.p_losses(
            0, params, images, jax.random.key(3),
            text_embeds=te, text_mask=tm, cond_images=cond * 3.0 + 1.0,
        ))
        assert np.isfinite([l0, l1]).all() and l0 != l1

    def test_sample_threads_cond_images_to_every_stage(self):
        cascade = self._cascade()
        te, tm = text_batch()
        params = [
            cascade.init_unet_params(
                i, jax.random.key(i), text_embed_dim=TEXT_DIM
            )
            for i in range(2)
        ]
        cond = jax.random.normal(jax.random.key(1), (2, 16, 16, 2))
        out = cascade.sample(
            params, jax.random.key(5), batch_size=2,
            text_embeds=te, text_mask=tm, cond_images=cond,
        )
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()
        out2 = cascade.sample(
            params, jax.random.key(5), batch_size=2,
            text_embeds=te, text_mask=tm, cond_images=cond * 3.0 + 1.0,
        )
        # both stages condition on the images (same rng, different cond)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_trainer_dict_batches_with_cond_images(self):
        cascade = Imagen(
            unets=[self._cond_unet()], image_sizes=(8,), channels=3,
            timesteps=10, cond_drop_prob=0.0,
        )
        trainer = ImagenTrainer(
            cascade,
            ImagenTrainerConfig(learning_rate=2e-3),
            text_embed_dim=TEXT_DIM,
        )
        te, tm = text_batch(2)
        batch = {
            "images": jax.random.uniform(jax.random.key(0), (2, 8, 8, 3)),
            "text_embeds": te,
            "text_mask": tm,
            "cond_images": jax.random.normal(jax.random.key(1), (2, 8, 8, 2)),
        }
        trainer.add_train_dataloader([batch])
        loss = trainer.train_step(1, rng=jax.random.key(2))
        assert np.isfinite(loss)
        out = trainer.sample(
            jax.random.key(3), batch_size=2, text_embeds=te, text_mask=tm,
            cond_images=batch["cond_images"],
        )
        assert out.shape == (2, 8, 8, 3)
