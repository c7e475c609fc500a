"""Round-3 knob-completion tests: full reference Unet knob surface
(imagen_pytorch.py:2349-2398) and the video-net depth additions
(imagen_video.py rel-pos bias, token-shift FF, frame scaling)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodelscustom_tpu.models.imagen.unet import (
    ImagenUNet,
    imagen_unet_from_ref_config,
)

REF_DEFAULT_CONFIG = Path("/root/reference/CascadedDDPM/default_config.json")


class TestRefConfigRoundtrip:
    def test_reference_default_config_unets_build(self):
        """Every unet dict in the reference's shipped default_config.json
        constructs without modification (default_config.json:10-36)."""
        if not REF_DEFAULT_CONFIG.exists():
            pytest.skip("reference tree not mounted")
        cfg = json.loads(REF_DEFAULT_CONFIG.read_text())
        for i, u in enumerate(cfg["imagen"]["unets"]):
            net = imagen_unet_from_ref_config(
                u, text_embed_dim=64, lowres_cond=i > 0
            )
            assert net.dim == u["dim"]
            assert net.attn_heads == u["attn_heads"]

    def test_every_reference_knob_accepted(self):
        """The complete Unet.__init__ kwarg surface
        (imagen_pytorch.py:2349-2398) maps through the factory, and the
        resulting net runs forward with the right output shape."""
        knobs = dict(
            dim=16, text_embed_dim=32, num_resnet_blocks=1, cond_dim=16,
            num_image_tokens=4, num_time_tokens=3,
            learned_sinu_pos_emb_dim=8, out_dim=3, dim_mults=[1, 2],
            cond_images_channels=0, channels=3, attn_dim_head=8,
            attn_heads=2, ff_mult=2, lowres_cond=False,
            layer_attns=[False, True], layer_attns_depth=2,
            layer_mid_attns_depth=2, layer_attns_add_text_cond=True,
            attend_at_middle=False, layer_cross_attns=[False, True],
            use_linear_attn=False, use_linear_cross_attn=False,
            cond_on_text=True, max_text_len=16, init_dim=12,
            resnet_groups=4, init_conv_kernel_size=3, init_cross_embed=True,
            init_cross_embed_kernel_sizes=[3, 7], cross_embed_downsample=False,
            cross_embed_downsample_kernel_sizes=[2, 4], attn_pool_text=True,
            attn_pool_num_latents=4, dropout=0.0, memory_efficient=False,
            init_conv_to_final_conv_residual=True,
            use_global_context_attn=True, scale_skip_connection=True,
            final_resnet_block=True, final_conv_kernel_size=1,
            self_cond=False, resize_mode="bilinear",
            combine_upsample_fmaps=True, pixel_shuffle_upsample=False,
        )
        net = imagen_unet_from_ref_config(knobs)
        assert net.num_time_tokens == 3
        assert net.init_dim == 12
        assert net.text_pool == "perceiver"
        x = jnp.zeros((2, 16, 16, 3))
        nc = jnp.zeros((2,))
        te = jnp.zeros((2, 5, 32))
        tm = jnp.ones((2, 5), bool)
        v = net.init(jax.random.key(0), x, nc, text_embeds=te, text_mask=tm)
        out = net.apply(v, x, nc, text_embeds=te, text_mask=tm)
        assert out.shape == (2, 16, 16, 3)
        # attend_at_middle=False: no bottleneck attention params (:2680)
        assert "mid_attn" not in v["params"]
        # layer_attns_depth=2: second stacked attn layer materialized
        attn = v["params"]["down_1_attn"]
        assert "qkv_d1" in attn and "ff1_d1" in attn
        # layer_attns_add_text_cond: context kv projection exists (:2370)
        assert "to_context" in attn

    def test_unknown_knob_rejected(self):
        with pytest.raises(TypeError, match="unknown Unet knob"):
            imagen_unet_from_ref_config({"dim": 16, "not_a_knob": 1})

    def test_init_dim_and_final_conv_kernel(self):
        net = imagen_unet_from_ref_config(
            dict(dim=16, dim_mults=[1, 2], init_dim=24,
                 final_conv_kernel_size=1, layer_attns=False,
                 layer_cross_attns=False, cond_on_text=False,
                 num_resnet_blocks=1)
        )
        x = jnp.zeros((1, 8, 8, 3))
        v = net.init(jax.random.key(0), x, jnp.zeros((1,)))
        assert v["params"]["init_conv"]["kernel"].shape[-1] == 24
        assert v["params"]["final_conv"]["kernel"].shape[:2] == (1, 1)
        out = net.apply(v, x, jnp.zeros((1,)))
        assert out.shape == x.shape

    def test_scalar_layer_attns_accepted(self):
        """default_config.json stage 3 uses `layer_attns: false` (a scalar)
        — the model must broadcast it per level (:34)."""
        net = ImagenUNet(
            dim=16, dim_mults=(1, 2), layer_attns=False,
            layer_cross_attns=False, cond_on_text=False,
            num_resnet_blocks=1, attend_at_middle=True,
        )
        x = jnp.zeros((1, 8, 8, 3))
        v = net.init(jax.random.key(0), x, jnp.zeros((1,)))
        out = net.apply(v, x, jnp.zeros((1,)))
        assert out.shape == x.shape
        assert not any(k.endswith("_attn") and k.startswith("down") for k in v["params"])


class TestCLIFullKnobSurface:
    def test_unet_config_extra_keys_flow_to_model(self):
        from diffusionmodelscustom_tpu.cli.imagen_cli import (
            RootConfig,
            _build_cascade,
        )

        cfg = RootConfig(
            **{
                "imagen": {
                    "image_sizes": [16, 32],
                    "unets": [
                        {
                            "dim": 16,
                            "dim_mults": [1, 2],
                            "num_resnet_blocks": 1,
                            "layer_attns": [False, True],
                            "layer_cross_attns": [False, True],
                            "attn_heads": 2,
                            # reference-named extras:
                            "attend_at_middle": False,
                            "layer_attns_depth": 2,
                            "num_time_tokens": 3,
                            "attn_dim_head": 8,
                        },
                        {
                            "dim": 16,
                            "dim_mults": [1, 2],
                            "num_resnet_blocks": 1,
                            "layer_attns": False,
                            "layer_cross_attns": [False, True],
                            "attn_heads": 2,
                        },
                    ],
                }
            }
        )
        cascade, _ = _build_cascade(cfg)
        assert cascade.unets[0].attend_at_middle is False
        assert cascade.unets[0].layer_attns_depth == 2
        assert cascade.unets[0].num_time_tokens == 3
        assert cascade.unets[1].lowres_cond is True

    def test_unknown_extra_key_fails_at_build(self):
        from diffusionmodelscustom_tpu.cli.imagen_cli import (
            RootConfig,
            _build_cascade,
        )

        cfg = RootConfig(
            **{"imagen": {"image_sizes": [16], "unets": [{"dim": 16, "bogus_knob": 1}]}}
        )
        with pytest.raises(TypeError, match="unknown Unet knob"):
            _build_cascade(cfg)


class TestVideoDepth:
    def test_time_token_shift_semantics(self):
        from diffusionmodelscustom_tpu.models.imagen.unet3d import (
            time_token_shift,
        )

        x = jnp.arange(2 * 3 * 1 * 1 * 4, dtype=jnp.float32).reshape(2, 3, 1, 1, 4)
        y = time_token_shift(x)
        # first channel half unchanged
        np.testing.assert_array_equal(np.asarray(y[..., :2]), np.asarray(x[..., :2]))
        # second half: frame 0 zeroed, frame i sees frame i-1
        assert (np.asarray(y[:, 0, ..., 2:]) == 0).all()
        np.testing.assert_array_equal(
            np.asarray(y[:, 1:, ..., 2:]), np.asarray(x[:, :-1, ..., 2:])
        )

    def test_dynamic_position_bias_shape_and_symmetry(self):
        from diffusionmodelscustom_tpu.models.imagen.unet3d import (
            DynamicPositionBias,
        )

        mod = DynamicPositionBias(dim=8, heads=3)
        v = mod.init(jax.random.key(0), 5)
        bias = mod.apply(v, 5)
        assert bias.shape == (3, 5, 5)
        # bias depends only on the frame offset: constant along diagonals
        b = np.asarray(bias)
        np.testing.assert_allclose(b[:, 0, 1], b[:, 3, 4], atol=1e-6)
        np.testing.assert_allclose(b[:, 2, 0], b[:, 4, 2], atol=1e-6)

    def test_scale_video_time(self):
        from diffusionmodelscustom_tpu.models.imagen.unet3d import (
            scale_video_time,
        )

        x = jax.random.normal(jax.random.key(0), (1, 4, 8, 8, 3))
        y = scale_video_time(x, 8)
        assert y.shape == (1, 8, 8, 8, 3)
        assert scale_video_time(x, 4) is x

    def test_unet3d_rel_pos_and_shift_ff_params(self):
        from diffusionmodelscustom_tpu.models.imagen import ImagenUNet3D

        unet = ImagenUNet3D(
            dim=8, dim_mults=(1, 2), channels=3,
            layer_attns=(False, True), layer_cross_attns=(False, False),
            temporal_attns=(True, True), attn_heads=2,
        )
        x = jax.random.normal(jax.random.key(0), (1, 4, 8, 8, 3))
        nc = jnp.zeros((1,))
        v = unet.init(jax.random.key(1), x, nc)
        # temporal attention carries the DynamicPositionBias MLP
        assert "rel_pos_bias" in v["params"]["down_0_tattn"]
        # attended level carries the token-shift feedforward
        assert "down_1_shift_ff" in v["params"]
        out = unet.apply(v, x, nc)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_unet3d_ignore_time_still_per_frame(self):
        """The new cross-frame ops (rel-pos bias attn, shift-FF) stay off
        under ignore_time, preserving per-frame independence."""
        from diffusionmodelscustom_tpu.models.imagen import ImagenUNet3D

        unet = ImagenUNet3D(
            dim=8, dim_mults=(1, 2), channels=3,
            layer_attns=(False, True), layer_cross_attns=(False, False),
            temporal_attns=(True, True), attn_heads=2,
        )
        x = jax.random.normal(jax.random.key(0), (1, 3, 8, 8, 3))
        nc = jnp.zeros((1,))
        v = unet.init(jax.random.key(1), x, nc)
        a = unet.apply(v, x, nc, ignore_time=True)
        x2 = x.at[:, 2].set(jax.random.normal(jax.random.key(7), (1, 8, 8, 3)))
        b = unet.apply(v, x2, nc, ignore_time=True)
        np.testing.assert_allclose(
            np.asarray(a[:, :2]), np.asarray(b[:, :2]), atol=1e-5
        )


class TestCascadeKnobs:
    def _video_cascade(self, **kw):
        from diffusionmodelscustom_tpu.models.imagen import Imagen, ImagenUNet3D

        unets = [
            ImagenUNet3D(dim=8, dim_mults=(1, 2), channels=3,
                         layer_attns=(False, False),
                         layer_cross_attns=(False, False),
                         temporal_attns=(False, False), attn_heads=2),
            ImagenUNet3D(dim=8, dim_mults=(1, 2), channels=3,
                         layer_attns=(False, False),
                         layer_cross_attns=(False, False),
                         temporal_attns=(False, False), attn_heads=2,
                         lowres_cond=True),
        ]
        return Imagen(
            unets=unets, image_sizes=(8, 16), channels=3, video=True,
            video_frames=8, timesteps=4, **kw,
        )

    def test_temporal_downsample_cascade_shapes(self):
        """Stage 1 generates at video_frames//factor frames; stage 2 at the
        full frame count, conditioning on the frame-scaled stage-1 output
        (imagen_pytorch.py:3487-3494,4129-4230)."""
        cascade = self._video_cascade(temporal_downsample_factor=(2, 1))
        rng = jax.random.key(0)
        params = [cascade.init_unet_params(i, jax.random.fold_in(rng, i))
                  for i in range(2)]
        # stage 1 alone: 4 frames
        stage1 = cascade.sample(params, rng, batch_size=1, stop_at_unet_number=1)
        assert stage1.shape == (1, 4, 8, 8, 3)
        out = cascade.sample(params, rng, batch_size=1)
        assert out.shape == (1, 8, 16, 16, 3)

    def test_temporal_downsample_train_loss(self):
        cascade = self._video_cascade(temporal_downsample_factor=(2, 1))
        rng = jax.random.key(0)
        videos = jax.random.uniform(rng, (2, 8, 16, 16, 3))
        for idx in range(2):
            params = cascade.init_unet_params(idx, jax.random.fold_in(rng, idx))
            loss = cascade.p_losses(idx, params, videos, jax.random.fold_in(rng, 7))
            assert np.isfinite(float(loss))

    def test_temporal_downsample_validation(self):
        with pytest.raises(AssertionError, match="last stage"):
            self._video_cascade(temporal_downsample_factor=(1, 2))

    def test_only_train_unet_number_locks(self):
        from diffusionmodelscustom_tpu.models.imagen import Imagen, ImagenUNet

        unet = ImagenUNet(dim=8, dim_mults=(1, 2), channels=3,
                          layer_attns=False, layer_cross_attns=False,
                          cond_on_text=False, num_resnet_blocks=1)
        cascade = Imagen(unets=[unet], image_sizes=(8,), channels=3,
                         timesteps=4, only_train_unet_number=1)
        rng = jax.random.key(0)
        params = cascade.init_unet_params(0, rng)
        loss = cascade.p_losses(0, params, jnp.zeros((1, 8, 8, 3)), rng)
        assert np.isfinite(float(loss))

    def test_min_snr_loss_weight_gate(self):
        from diffusionmodelscustom_tpu.models.imagen import Imagen, ImagenUNet

        unet = ImagenUNet(dim=8, dim_mults=(1, 2), channels=3,
                          layer_attns=False, layer_cross_attns=False,
                          cond_on_text=False, num_resnet_blocks=1)
        rng = jax.random.key(0)
        imgs = jax.random.uniform(rng, (2, 8, 8, 3))
        on = Imagen(unets=[unet], image_sizes=(8,), channels=3, timesteps=4,
                    min_snr_loss_weight=True)
        off = Imagen(unets=[unet], image_sizes=(8,), channels=3, timesteps=4,
                     min_snr_loss_weight=False)
        params = on.init_unet_params(0, rng)
        l_on = float(on.p_losses(0, params, imgs, jax.random.fold_in(rng, 1)))
        l_off = float(off.p_losses(0, params, imgs, jax.random.fold_in(rng, 1)))
        # same rng path; weighting changes the value
        assert np.isfinite(l_on) and np.isfinite(l_off)
        assert l_on != l_off

    def test_resize_mode_flows(self):
        from diffusionmodelscustom_tpu.models.imagen import Imagen, ImagenUNet

        unet = ImagenUNet(dim=8, dim_mults=(1, 2), channels=3,
                          layer_attns=False, layer_cross_attns=False,
                          cond_on_text=False, num_resnet_blocks=1,
                          lowres_cond=True)
        for mode in ("nearest", "bilinear"):
            cascade = Imagen(unets=[ImagenUNet(dim=8, dim_mults=(1, 2),
                                               channels=3, layer_attns=False,
                                               layer_cross_attns=False,
                                               cond_on_text=False,
                                               num_resnet_blocks=1), unet],
                             image_sizes=(8, 16), channels=3, timesteps=4,
                             resize_mode=mode)
            x = jax.random.uniform(jax.random.key(0), (1, 8, 8, 3))
            resized = cascade._resize(x, 16)
            assert resized.shape == (1, 16, 16, 3)


class TestUnet3DKnobs:
    def test_ref_config_factory_full_surface(self):
        from diffusionmodelscustom_tpu.models.imagen.unet3d import (
            unet3d_from_ref_config,
        )

        knobs = dict(
            dim=8, text_embed_dim=16, num_resnet_blocks=1, cond_dim=8,
            num_image_tokens=4, num_time_tokens=3,
            learned_sinu_pos_emb_dim=8, out_dim=3, dim_mults=[1, 2],
            temporal_strides=[1, 2], cond_images_channels=0, channels=3,
            attn_dim_head=8, attn_heads=2, ff_mult=2,
            ff_time_token_shift=True, lowres_cond=False,
            layer_attns=[False, True], layer_attns_depth=2,
            layer_attns_add_text_cond=True, attend_at_middle=True,
            time_rel_pos_bias_depth=1, time_causal_attn=True,
            layer_cross_attns=[False, True], use_linear_attn=False,
            use_linear_cross_attn=False, cond_on_text=True, max_text_len=8,
            init_dim=12, resnet_groups=4, init_conv_kernel_size=3,
            dropout=0.0, memory_efficient=False,
            init_conv_to_final_conv_residual=True,
            use_global_context_attn=False, scale_skip_connection=True,
            final_resnet_block=True, final_conv_kernel_size=1,
            self_cond=False, resize_mode="nearest",
        )
        net = unet3d_from_ref_config(knobs)
        assert net.channels_out == 3 and net.num_time_tokens == 3
        assert net.time_causal_attn is True
        x = jnp.zeros((1, 4, 8, 8, 3))
        nc = jnp.zeros((1,))
        te = jnp.zeros((1, 4, 16))
        tm = jnp.ones((1, 4), bool)
        v = net.init(jax.random.key(0), x, nc, text_embeds=te, text_mask=tm)
        out = net.apply(v, x, nc, text_embeds=te, text_mask=tm)
        assert out.shape == (1, 4, 8, 8, 3)
        assert np.isfinite(np.asarray(out)).all()
        assert "mid_attn" in v["params"]
        assert "final_res_block" in v["params"]

    def test_realistic_video_config_roundtrip(self):
        """Round-2 VERDICT item 10: a REALISTIC imagen-video config — the
        reference Unet3D's own defaults plus the knobs real video configs
        set (imagen_video.py:1226-1278 kwarg surface, scalar
        temporal_strides=1, attn_pool_text=True, pixel_shuffle_upsample)
        — parses through unet3d_from_ref_config and runs, at toy dims."""
        from diffusionmodelscustom_tpu.models.imagen.unet3d import (
            unet3d_from_ref_config,
        )

        knobs = dict(
            # every reference __init__ kwarg, at its reference default
            # except the dims (toy) and per-level lists (2 levels)
            dim=8, text_embed_dim=16, num_resnet_blocks=1, cond_dim=None,
            num_image_tokens=4, num_time_tokens=2,
            learned_sinu_pos_emb_dim=8, out_dim=None, dim_mults=[1, 2],
            temporal_strides=1,  # reference default: SCALAR
            cond_images_channels=0, channels=3, channels_out=None,
            attn_dim_head=8, attn_heads=2, ff_mult=2.0,
            ff_time_token_shift=True, lowres_cond=False,
            layer_attns=False, layer_attns_depth=1,
            layer_attns_add_text_cond=True, attend_at_middle=True,
            time_rel_pos_bias_depth=2, time_causal_attn=True,
            layer_cross_attns=True, use_linear_attn=False,
            use_linear_cross_attn=False, cond_on_text=True,
            max_text_len=8, init_dim=None, resnet_groups=4,
            init_conv_kernel_size=7, init_cross_embed=True,
            init_cross_embed_kernel_sizes=(3, 7, 15),
            cross_embed_downsample=False,
            cross_embed_downsample_kernel_sizes=(2, 4),
            attn_pool_text=True, attn_pool_num_latents=4,
            dropout=0.0, memory_efficient=False,
            init_conv_to_final_conv_residual=False,
            use_global_context_attn=True, scale_skip_connection=True,
            final_resnet_block=True, final_conv_kernel_size=3,
            self_cond=False, combine_upsample_fmaps=False,
            pixel_shuffle_upsample=True, resize_mode="nearest",
        )
        net = unet3d_from_ref_config(knobs)
        assert net.text_pool == "perceiver" and net.num_latents == 4
        x = jnp.zeros((1, 3, 8, 8, 3))
        nc = jnp.zeros((1,))
        te = jax.random.normal(jax.random.key(2), (1, 4, 16))
        tm = jnp.ones((1, 4), bool)
        v = net.init(jax.random.key(0), x, nc, text_embeds=te, text_mask=tm)
        assert "perceiver" in v["params"]
        out = net.apply(v, x, nc, text_embeds=te, text_mask=tm)
        assert out.shape == (1, 3, 8, 8, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_attn_pool_text_false_maps_to_masked_mean(self):
        from diffusionmodelscustom_tpu.models.imagen.unet3d import (
            unet3d_from_ref_config,
        )

        net = unet3d_from_ref_config({"dim": 8, "attn_pool_text": False})
        assert net.text_pool == "attention_pool"

    def test_unknown_3d_knob_rejected(self):
        from diffusionmodelscustom_tpu.models.imagen.unet3d import (
            unet3d_from_ref_config,
        )

        with pytest.raises(TypeError, match="unknown Unet3D knob"):
            unet3d_from_ref_config({"dim": 8, "bogus": 1})

    def test_causal_temporal_attention_is_causal(self):
        """With causal masking, earlier frames must not see later ones:
        perturbing frame 3 cannot change attention output at frames 0-2."""
        from diffusionmodelscustom_tpu.models.imagen.unet3d import (
            TemporalAttention,
        )

        mod = TemporalAttention(n_heads=2, causal=True, rel_pos_bias=False)
        x = jax.random.normal(jax.random.key(0), (1, 4, 2, 2, 8))
        v = mod.init(jax.random.key(1), x)
        a = mod.apply(v, x)
        x2 = x.at[:, 3].set(jax.random.normal(jax.random.key(5), (1, 2, 2, 8)))
        b = mod.apply(v, x2)
        np.testing.assert_allclose(
            np.asarray(a[:, :3]), np.asarray(b[:, :3]), atol=1e-5
        )

    def test_cli_video_mode_builds_unet3d(self):
        from diffusionmodelscustom_tpu.cli.imagen_cli import (
            RootConfig,
            _build_cascade,
        )
        from diffusionmodelscustom_tpu.models.imagen import ImagenUNet3D

        cfg = RootConfig(
            **{
                "imagen": {
                    "video": True,
                    "video_frames": 4,
                    "image_sizes": [8],
                    "timesteps": 4,
                    "unets": [
                        {"dim": 8, "dim_mults": [1, 2], "num_resnet_blocks": 1,
                         "layer_attns": False, "layer_cross_attns": False,
                         "attn_heads": 2}
                    ],
                }
            }
        )
        cascade, _ = _build_cascade(cfg)
        assert isinstance(cascade.unets[0], ImagenUNet3D)
        assert cascade.video is True


class TestElucidatedCLIKnobs:
    def test_edm_knobs_flow_to_cascade(self):
        from diffusionmodelscustom_tpu.cli.imagen_cli import (
            RootConfig,
            _build_cascade,
        )

        cfg = RootConfig(
            **{
                "type": "elucidated",
                "imagen": {
                    "image_sizes": [8, 16],
                    "num_sample_steps": [8, 16],
                    "sigma_min": 0.004,
                    "S_churn": [40.0, 60.0],
                    "unets": [
                        {"dim": 8, "dim_mults": [1, 2], "num_resnet_blocks": 1,
                         "layer_attns": False, "layer_cross_attns": False,
                         "attn_heads": 2},
                        {"dim": 8, "dim_mults": [1, 2], "num_resnet_blocks": 1,
                         "layer_attns": False, "layer_cross_attns": False,
                         "attn_heads": 2},
                    ],
                },
            }
        )
        cascade, _ = _build_cascade(cfg)
        assert cascade.edm_configs[0].num_sample_steps == 8
        assert cascade.edm_configs[1].num_sample_steps == 16
        assert cascade.edm_configs[0].sigma_min == 0.004
        assert cascade.edm_configs[0].S_churn == 40.0
        assert cascade.edm_configs[1].S_churn == 60.0

    def test_null_unet_stage(self):
        from diffusionmodelscustom_tpu.cli.imagen_cli import (
            RootConfig,
            _build_cascade,
        )
        from diffusionmodelscustom_tpu.models.imagen import NullUnet

        cfg = RootConfig(
            **{
                "imagen": {
                    "image_sizes": [8, 16],
                    "timesteps": 4,
                    "unets": [
                        {"is_null": True},
                        {"dim": 8, "dim_mults": [1, 2], "num_resnet_blocks": 1,
                         "layer_attns": False, "layer_cross_attns": False,
                         "attn_heads": 2},
                    ],
                }
            }
        )
        cascade, _ = _build_cascade(cfg)
        assert isinstance(cascade.unets[0], NullUnet)
        # null stage passes a start image through; SR stage refines it
        import jax

        params = [
            cascade.unets[0].init(jax.random.key(0)),
            cascade.init_unet_params(1, jax.random.key(1)),
        ]
        out = cascade.sample(
            params, jax.random.key(2), batch_size=1,
            start_image_or_video=jnp.zeros((1, 8, 8, 3)),
            start_at_unet_number=2,
        )
        assert out.shape == (1, 16, 16, 3)
