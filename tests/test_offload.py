"""Model-offload hooks: same outputs, params staged per stage."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_pipeline import DummyTokenizer
from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from upscale_a_video_tpu.pipeline.pipeline import PipelineModules, VideoUpscalePipeline
from upscale_a_video_tpu.sampling import DDIMScheduler, DDIMSchedulerConfig, DDPMScheduler


def _build():
    unet_cfg = UNetVideoConfig(block_out_channels=(8, 16, 16, 32),
                               attention_head_dim=4, norm_num_groups=4,
                               cross_attention_dim=16)
    vae_cfg = VaeConfig(block_out_channels=(8, 16, 16), norm_num_groups=4)
    clip_cfg = CLIPTextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                              num_hidden_layers=2, num_attention_heads=2,
                              max_position_embeddings=8)
    unet = UNetVideoModel(unet_cfg)
    vae = AutoencoderKLVideo(vae_cfg)
    clip = CLIPTextModel(clip_cfg)
    modules = PipelineModules(
        unet=unet,
        unet_params=unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), 0,
                              jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 8, 16)), 0),
        vae=vae, vae_params=vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3))),
        text_encoder=clip,
        text_params=clip.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32)),
        tokenizer=DummyTokenizer(),
        scheduler=DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear")),
        low_res_scheduler=DDPMScheduler(),
    )
    return VideoUpscalePipeline(modules, dtype=jnp.float32)


@pytest.mark.slow
def test_offload_same_output():
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 2, 8, 8, 3),
                             minval=-1, maxval=1)
    pipe = _build()
    a = pipe("x", img, num_inference_steps=2, guidance_scale=1.0, noise_level=20,
             key=jax.random.PRNGKey(4))
    pipe.enable_model_offload()
    b = pipe("x", img, num_inference_steps=2, guidance_scale=1.0, noise_level=20,
             key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
