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
