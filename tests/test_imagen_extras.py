"""Tests for the Imagen extras: perceiver/cross-embed/pixel-shuffle blocks,
remat, self-conditioning, video UNet3D, inpainting."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodelscustom_tpu.core import ContinuousDiffusion
from diffusionmodelscustom_tpu.models.imagen import (
    CrossEmbedLayer,
    Imagen,
    ImagenUNet,
    ImagenUNet3D,
    PerceiverResampler,
    PixelShuffleUpsample,
)
from diffusionmodelscustom_tpu.sampling import p_sample_loop_continuous

TEXT_DIM = 32


class TestBlocks:
    def test_perceiver_resampler_shapes_and_mask(self):
        m = PerceiverResampler(depth=1, num_latents=4, n_heads=2, head_dim=8)
        tokens = jax.random.normal(jax.random.key(0), (2, 6, 16))
        mask = jnp.array([[True] * 6, [True, True] + [False] * 4])
        params = m.init(jax.random.key(1), tokens, mask)
        out = m.apply(params, tokens, mask)
        assert out.shape == (2, 4, 16)
        # fully padding tokens beyond position 2 must not change sample 1
        tokens2 = tokens.at[1, 2:].set(999.0)
        out2 = m.apply(params, tokens2, mask)
        np.testing.assert_allclose(
            np.asarray(out[1]), np.asarray(out2[1]), atol=1e-5
        )

    def test_cross_embed_channels(self):
        m = CrossEmbedLayer(dim_out=32, kernel_sizes=(3, 7), stride=2)
        x = jnp.zeros((1, 16, 16, 4))
        params = m.init(jax.random.key(0), x)
        out = m.apply(params, x)
        assert out.shape == (1, 8, 8, 32)

    def test_pixel_shuffle_upsample(self):
        m = PixelShuffleUpsample(dim_out=8)
        x = jnp.zeros((1, 4, 4, 16))
        params = m.init(jax.random.key(0), x)
        assert m.apply(params, x).shape == (1, 8, 8, 8)


class TestFullFeatureUNet:
    def test_all_knobs_and_remat_grad(self):
        unet = ImagenUNet(
            dim=16, dim_mults=(1, 2), channels=1, text_embed_dim=TEXT_DIM,
            num_resnet_blocks=1, layer_attns=(False, True),
            layer_cross_attns=(False, True), attn_heads=2, learned_sinu_dim=8,
            text_pool="perceiver", num_latents=4, use_cross_embed=True,
            pixel_shuffle_upsample=True, use_global_context=True,
            memory_efficient=True, self_cond=True,
        )
        x = jnp.zeros((2, 16, 16, 1))
        nc = jnp.zeros((2,))
        te = jax.random.normal(jax.random.key(0), (2, 4, TEXT_DIM))
        tm = jnp.ones((2, 4), bool)
        params = unet.init(jax.random.key(1), x, nc, text_embeds=te, text_mask=tm)
        out = unet.apply(params, x, nc, text_embeds=te, text_mask=tm,
                         self_cond=jnp.zeros_like(x))
        assert out.shape == x.shape
        grads = jax.grad(
            lambda p: jnp.sum(
                unet.apply(p, x, nc, text_embeds=te, text_mask=tm) ** 2
            )
        )(params)
        assert all(
            np.isfinite(np.asarray(g)).all()
            for g in jax.tree_util.tree_leaves(grads)
        )


class TestSelfCond:
    def test_self_cond_training_loss_finite(self):
        unet = ImagenUNet(
            dim=8, dim_mults=(1, 2), channels=1, text_embed_dim=TEXT_DIM,
            num_resnet_blocks=1, layer_attns=(False, False),
            layer_cross_attns=(False, True), attn_heads=2,
            learned_sinu_dim=8, self_cond=True,
        )
        cascade = Imagen(unets=[unet], image_sizes=(8,), channels=1, timesteps=8)
        params = cascade.init_unet_params(0, jax.random.key(0), text_embed_dim=TEXT_DIM)
        te = jax.random.normal(jax.random.key(1), (2, 3, TEXT_DIM))
        tm = jnp.ones((2, 3), bool)
        loss = cascade.p_losses(
            0, params, jax.random.uniform(jax.random.key(2), (2, 8, 8, 1)),
            jax.random.key(3), text_embeds=te, text_mask=tm,
        )
        assert np.isfinite(float(loss))


class TestVideo:
    def make(self):
        unet = ImagenUNet3D(
            dim=8, dim_mults=(1, 2), channels=1, text_embed_dim=TEXT_DIM,
            num_resnet_blocks=1, layer_attns=(False, True),
            layer_cross_attns=(False, True), temporal_attns=(False, True),
            attn_heads=2, learned_sinu_dim=8,
        )
        return Imagen(
            unets=[unet], image_sizes=(8,), channels=1, video=True,
            video_frames=4, timesteps=6,
        )

    def test_video_train_and_sample(self):
        cascade = self.make()
        params = cascade.init_unet_params(0, jax.random.key(0), text_embed_dim=TEXT_DIM)
        videos = jax.random.uniform(jax.random.key(1), (2, 4, 8, 8, 1))
        te = jax.random.normal(jax.random.key(2), (2, 3, TEXT_DIM))
        tm = jnp.ones((2, 3), bool)
        loss = cascade.p_losses(
            0, params, videos, jax.random.key(3), text_embeds=te, text_mask=tm
        )
        assert np.isfinite(float(loss))
        out = cascade.sample(
            [params], jax.random.key(4), batch_size=1,
            text_embeds=te[:1], text_mask=tm[:1],
        )
        assert out.shape == (1, 4, 8, 8, 1)
        assert np.isfinite(np.asarray(out)).all()


class TestInpainting:
    def test_known_region_preserved(self):
        sch = ContinuousDiffusion(num_timesteps=20)
        target = 0.5

        def model_fn(x, log_snr, t):
            from diffusionmodelscustom_tpu.core.schedules import (
                log_snr_to_alpha_sigma,
                right_pad_dims_to,
            )

            a, s = log_snr_to_alpha_sigma(right_pad_dims_to(x, log_snr))
            return (x - a * target) / jnp.clip(s, 1e-8, None)

        known = jnp.full((1, 8, 8, 1), -0.8)
        mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)  # top half known
        out = p_sample_loop_continuous(
            model_fn, sch, jax.random.key(0), (1, 8, 8, 1),
            inpaint_images=known, inpaint_masks=mask, resample_times=2,
        )
        out = np.asarray(out)
        # known region exactly restored; unknown region near the model's target
        np.testing.assert_allclose(out[:, :4], -0.8, atol=1e-6)
        assert abs(out[:, 4:].mean() - target) < 0.2


class TestVideoTemporal:
    """Round-2 video completeness: temporal pixel-shuffle upsample /
    downsample (imagen_video.py:645-683), ignore_time, frame resizing."""

    def _unet(self, **kw):
        base = dict(
            dim=8, dim_mults=(1, 2), channels=3, text_embed_dim=16,
            num_resnet_blocks=1, layer_attns=(False, True),
            layer_cross_attns=(False, False), temporal_attns=(True, True),
            attn_heads=2, learned_sinu_dim=8,
        )
        base.update(kw)
        return ImagenUNet3D(**base)

    def test_temporal_down_up_modules_roundtrip_shapes(self):
        from diffusionmodelscustom_tpu.models.imagen import (
            TemporalDownsample, TemporalPixelShuffleUpsample,
        )

        x = jax.random.normal(jax.random.key(0), (2, 8, 4, 4, 6))
        down = TemporalDownsample(6, stride=2)
        pd = down.init(jax.random.key(1), x)
        y = down.apply(pd, x)
        assert y.shape == (2, 4, 4, 4, 6)
        up = TemporalPixelShuffleUpsample(6, stride=2)
        pu = up.init(jax.random.key(2), y)
        z = up.apply(pu, y)
        assert z.shape == x.shape

    def test_temporal_peg_module_and_placement(self):
        """TemporalPEG (imagen_video.py:1412-1413): depthwise residual
        frame conv; causal variant must not leak future frames; the net
        places one before every temporal attention + at init."""
        from diffusionmodelscustom_tpu.models.imagen.unet3d import TemporalPEG

        x = jax.random.normal(jax.random.key(0), (2, 6, 4, 4, 8))
        peg = TemporalPEG(8, causal=True)
        p = peg.init(jax.random.key(1), x)
        y = peg.apply(p, x)
        assert y.shape == x.shape
        # causality: perturbing the LAST frame leaves earlier outputs alone
        x2 = x.at[:, -1].set(0.0)
        y2 = peg.apply(p, x2)
        np.testing.assert_allclose(
            np.asarray(y[:, :-1]), np.asarray(y2[:, :-1]), atol=1e-6
        )
        # depthwise: kernel is (3, 1, C) (feature_group_count = C)
        assert p["params"]["conv"]["kernel"].shape == (3, 1, 8)

        unet = self._unet()
        xv = jax.random.normal(jax.random.key(2), (1, 3, 16, 16, 3))
        params = unet.init(jax.random.key(3), xv, jnp.zeros((1,)))["params"]
        peg_names = [k for k in params if k.endswith("_peg") or k == "init_tpeg"]
        assert "init_tpeg" in peg_names
        assert any(k.startswith("down_") for k in peg_names)
        assert any(k.startswith("up_") for k in peg_names)
        assert "mid_tattn_peg" in peg_names

    def test_unet3d_with_temporal_strides(self):
        unet = self._unet(temporal_strides=(1, 2))
        x = jax.random.normal(jax.random.key(0), (1, 4, 16, 16, 3))
        nc = jnp.zeros((1,))
        params = unet.init(jax.random.key(1), x, nc)
        out = unet.apply(params, x, nc)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_ignore_time_frames_independent(self):
        # with ignore_time, each output frame depends only on its own input
        # frame (the reference's images-as-video pathway)
        unet = self._unet()
        x = jax.random.normal(jax.random.key(0), (1, 3, 16, 16, 3))
        nc = jnp.zeros((1,))
        params = unet.init(jax.random.key(1), x, nc)  # init WITH time params
        full = unet.apply(params, x, nc, ignore_time=True)
        # perturb frame 2 only; frames 0-1 outputs must not change
        x2 = x.at[:, 2].set(jax.random.normal(jax.random.key(5), (1, 16, 16, 3)))
        out2 = unet.apply(params, x2, nc, ignore_time=True)
        np.testing.assert_allclose(
            np.asarray(full[:, :2]), np.asarray(out2[:, :2]), atol=1e-5
        )
        assert not np.allclose(np.asarray(full[:, 2]), np.asarray(out2[:, 2]))

    def test_resize_video(self):
        from diffusionmodelscustom_tpu.ops.resize import resize_video

        x = jax.random.normal(jax.random.key(0), (2, 4, 8, 8, 3))
        y = resize_video(x, 8, 16, 16)
        assert y.shape == (2, 8, 16, 16, 3)
        assert resize_video(x, 4, 8, 8) is x
