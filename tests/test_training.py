"""Training-step tests: UNet denoising loss with temporal-only freezing, VAE
GAN losses, LR schedules."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
from upscale_a_video_tpu.sampling import DDIMScheduler, DDIMSchedulerConfig, DDPMScheduler
from upscale_a_video_tpu.training import make_train_step, temporal_param_mask
from upscale_a_video_tpu.training.lr_schedules import get_lr_schedule
from upscale_a_video_tpu.training.train_unet import init_optimizer
from upscale_a_video_tpu.training.train_vae import (
    PatchDiscriminator,
    vae_training_losses,
)

TINY = UNetVideoConfig(
    block_out_channels=(8, 16, 16, 32), attention_head_dim=4,
    norm_num_groups=4, cross_attention_dim=16,
)


def _tree_items(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_items(v, prefix + (k,))
    else:
        yield prefix, tree


class TestUNetTraining:
    def test_temporal_mask_selects_temporal_params(self):
        model = UNetVideoModel(TINY)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), 0,
                            jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 3, 16)), 0)
        mask = temporal_param_mask(params)
        flags = dict(_tree_items(mask))
        marked = [p for p, v in flags.items() if v]
        unmarked = [p for p, v in flags.items() if not v]
        assert any("down_temp_blocks_0" in "/".join(p) for p in marked)
        assert any("attn_temporal" in "/".join(p) for p in marked)
        assert any("resblock_temporal" in "/".join(p) for p in marked)
        assert all("conv_in" not in "/".join(p) for p in marked)
        assert any("conv_in" in "/".join(p) for p in unmarked)

    @pytest.mark.slow
    def test_train_step_updates_only_temporal(self):
        model = UNetVideoModel(TINY)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), 0,
                            jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 3, 16)), 0)
        sched = DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear"))
        lrs = DDPMScheduler()
        opt = optax.sgd(1e-2)
        opt_state = init_optimizer(params, opt)
        step = make_train_step(model, sched, lrs, opt, donate=False)

        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4)),
            "low_res": jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 8, 3)),
            "text_embeds": jax.random.normal(jax.random.PRNGKey(3), (1, 3, 16)),
        }
        new_params, _, loss = step(params, opt_state, batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(loss))

        before = dict(_tree_items(params["params"]))
        after = dict(_tree_items(new_params["params"]))
        mask = dict(_tree_items(temporal_param_mask(params)["params"]))
        changed = {p for p in before
                   if not np.allclose(np.asarray(before[p]), np.asarray(after[p]))}
        # frozen params must not move
        for p in changed:
            assert mask[p], f"non-temporal param {p} changed"
        # at least some temporal params must move
        assert changed


class TestVaeGAN:
    @pytest.mark.slow
    def test_generator_and_disc_losses(self):
        cfg = VaeConfig(block_out_channels=(8, 16, 16), norm_num_groups=4,
                        up_block_types=("UpDecoderBlock3D_plus",) * 3,
                        condition_img=True, condition_channels=8)
        vae = AutoencoderKLVideo(cfg)
        z = jnp.zeros((1, 1, 4, 4, 4))
        img = jnp.zeros((1, 1, 4, 4, 3))
        vae_params = vae.init(jax.random.PRNGKey(0), z, method=vae.decode, img=img)

        disc = PatchDiscriminator(base_channels=8, num_layers=2)
        disc_params = disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))

        latents = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 4, 4, 4))
        inputs = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 4, 4, 3))
        gts = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 16, 16, 3))

        g_loss, recon = vae_training_losses(vae, vae_params, disc, disc_params,
                                            inputs, gts, latents, optimizer_idx=0)
        d_loss, _ = vae_training_losses(vae, vae_params, disc, disc_params,
                                        inputs, gts, latents, optimizer_idx=1)
        assert np.isfinite(float(g_loss))
        assert np.isfinite(float(d_loss))
        assert recon.shape == gts.shape

    @pytest.mark.slow
    def test_disc_grad_does_not_touch_vae(self):
        cfg = VaeConfig(block_out_channels=(8, 16, 16), norm_num_groups=4)
        vae = AutoencoderKLVideo(cfg)
        vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16, 3)))
        disc = PatchDiscriminator(base_channels=8, num_layers=2)
        disc_params = disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
        latents = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 4, 4, 4))
        gts = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 16, 16, 3))

        def d_loss_wrt_vae(vp):
            loss, _ = vae_training_losses(vae, vp, disc, disc_params, None, gts,
                                          latents, optimizer_idx=1)
            return loss

        grads = jax.grad(d_loss_wrt_vae)(vae_params)
        total = sum(float(jnp.sum(jnp.abs(g))) for _, g in _tree_items(grads))
        assert total == 0.0  # stop_gradient severs the generator


class TestLRSchedules:
    def test_warmup(self):
        s = get_lr_schedule("warmup", 1e-3, warmup_steps=100)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(50)), 5e-4)
        np.testing.assert_allclose(float(s(100)), 1e-3)
        np.testing.assert_allclose(float(s(500)), 1e-3)

    def test_cosine(self):
        s = get_lr_schedule("cosine", 1e-3, decay_steps=100)
        np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-5)
        assert float(s(100)) < 1e-5
