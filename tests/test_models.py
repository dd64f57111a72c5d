"""Shape/finite-ness tests for the UNet and VAE on tiny configs.

Full-size configs are exercised in test_reference_configs.py; these tiny
variants keep CPU runtime low while covering every block type and code path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel

TINY_UNET = UNetVideoConfig(
    block_out_channels=(8, 16, 16, 32),
    attention_head_dim=4,
    norm_num_groups=4,
    cross_attention_dim=16,
    num_class_embeds=1000,
)

TINY_VAE_3D = VaeConfig(
    block_out_channels=(8, 16, 16),
    norm_num_groups=4,
    latent_channels=4,
)

TINY_VAE_VIDEO = VaeConfig(
    block_out_channels=(8, 16, 16),
    norm_num_groups=4,
    latent_channels=4,
    up_block_types=("UpDecoderBlock3D_plus",) * 3,
    condition_img=True,
    condition_channels=8,
    use_temporal_block=True,
)


@pytest.fixture(scope="module")
def unet_and_params():
    model = UNetVideoModel(TINY_UNET)
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 4, 16, 16, 4))
    low_res = jnp.zeros((1, 4, 16, 16, 3))
    ctx = jnp.zeros((1, 7, 16))
    params = model.init(key, sample, 10, low_res, ctx, 20)
    return model, params


class TestUNet:
    def test_forward_shape(self, unet_and_params):
        model, params = unet_and_params
        sample = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16, 4))
        low_res = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16, 16, 3))
        ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16))
        out = model.apply(params, sample, 10, low_res, ctx, 20)
        assert out.shape == (1, 4, 16, 16, 4)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.slow
    def test_forward_non_divisible_by_8(self, unet_and_params):
        # H=W=12 exercises the upsample-size forcing path (ref unet_video.py:433-443)
        model, params = unet_and_params
        sample = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 12, 12, 4))
        low_res = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 12, 12, 3))
        ctx = jax.random.normal(jax.random.PRNGKey(6), (1, 7, 16))
        out = model.apply(params, sample, 10, low_res, ctx, 20)
        assert out.shape == (1, 4, 12, 12, 4)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.slow
    def test_timestep_changes_output(self, unet_and_params):
        model, params = unet_and_params
        sample = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 16, 16, 4))
        low_res = jnp.zeros((1, 4, 16, 16, 3))
        ctx = jnp.zeros((1, 7, 16))
        a = model.apply(params, sample, 10, low_res, ctx, 20)
        b = model.apply(params, sample, 900, low_res, ctx, 20)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_noise_level_changes_output(self, unet_and_params):
        model, params = unet_and_params
        sample = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 16, 16, 4))
        low_res = jnp.zeros((1, 4, 16, 16, 3))
        ctx = jnp.zeros((1, 7, 16))
        a = model.apply(params, sample, 10, low_res, ctx, 20)
        b = model.apply(params, sample, 10, low_res, ctx, 120)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_reference_json_config_parses(self):
        cfg = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
        assert cfg.in_channels == 7
        assert cfg.block_out_channels == (256, 512, 512, 1024)
        assert cfg.only_cross_attention == (True, True, True, False)
        assert cfg.down_temporal_idx == (0, 1, 2, 3)
        assert cfg.mid_temporal


class TestVae3D:
    @pytest.fixture(scope="class")
    def vae(self):
        model = AutoencoderKLVideo(TINY_VAE_3D)
        x = jnp.zeros((1, 2, 16, 16, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        return model, params

    def test_encode_shape(self, vae):
        model, params = vae
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 16, 3))
        moments = model.apply(params, x, method=model.encode_moments)
        # 2 downsample stages → /4 spatial, 2*latent channels
        assert moments.shape == (1, 2, 4, 4, 8)

    def test_decode_upscales_4x(self, vae):
        model, params = vae
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 4, 4))
        out = model.apply(params, z, method=model.decode)
        assert out.shape == (1, 2, 16, 16, 3)

    def test_roundtrip_finite(self, vae):
        model, params = vae
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 16, 16, 3))
        out = model.apply(params, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_reference_json_config_parses(self):
        cfg = VaeConfig.from_json("/root/reference/configs/vae_3d_config.json")
        assert cfg.block_out_channels == (128, 256, 512)
        assert not cfg.condition_img
        assert cfg.spatial_scale == 4
        assert abs(cfg.scaling_factor - 0.08333) < 1e-9


class TestVaeVideo:
    @pytest.fixture(scope="class")
    def vae(self):
        model = AutoencoderKLVideo(TINY_VAE_VIDEO)
        z = jnp.zeros((1, 2, 4, 4, 4))
        img = jnp.zeros((1, 2, 4, 4, 3))
        params = model.init(jax.random.PRNGKey(0), z, method=model.decode, img=img)
        return model, params

    def test_conditional_decode(self, vae):
        model, params = vae
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4, 4))
        img = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 4, 3))
        out = model.apply(params, z, method=model.decode, img=img, w_lr=1.0)
        assert out.shape == (1, 2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_w_lr_gates_condition(self, vae):
        model, params = vae
        z = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 4, 4, 4))
        img_a = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 4, 4, 3))
        img_b = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 4, 4, 3))
        # w_lr=0 → LR condition has no effect... the SFT residual is scaled by w
        out_a = model.apply(params, z, method=model.decode, img=img_a, w_lr=0.0)
        out_b = model.apply(params, z, method=model.decode, img=img_b, w_lr=0.0)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
        # w_lr=1 → different LR inputs give different outputs
        out_c = model.apply(params, z, method=model.decode, img=img_a, w_lr=1.0)
        out_d = model.apply(params, z, method=model.decode, img=img_b, w_lr=1.0)
        assert not np.allclose(np.asarray(out_c), np.asarray(out_d), atol=1e-5)

    def test_reference_json_config_parses(self):
        cfg = VaeConfig.from_json("/root/reference/configs/vae_video_config.json")
        assert cfg.condition_img
        assert cfg.condition_channels == 128
        assert cfg.is_plus


class TestRemat:
    @pytest.mark.slow
    def test_remat_same_output_and_grads_work(self):
        model = UNetVideoModel(TINY_UNET)
        model_r = UNetVideoModel(TINY_UNET, use_remat=True)
        sample = jax.random.normal(jax.random.PRNGKey(20), (1, 2, 8, 8, 4))
        low_res = jax.random.normal(jax.random.PRNGKey(21), (1, 2, 8, 8, 3))
        ctx = jax.random.normal(jax.random.PRNGKey(22), (1, 3, 16))
        params = model.init(jax.random.PRNGKey(23), sample, 10, low_res, ctx, 20)

        a = model.apply(params, sample, 10, low_res, ctx, 20)
        b = model_r.apply(params, sample, 10, low_res, ctx, 20)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

        def loss(p):
            return jnp.mean(model_r.apply(p, sample, 10, low_res, ctx, 20) ** 2)

        grads = jax.grad(loss)(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
