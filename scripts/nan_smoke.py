"""--jax_debug_nans smoke job (SURVEY §5.2): run a tiny end-to-end pipeline
(denoise scan + propagation + chunked decode) with NaN trapping on. Any NaN
produced anywhere under jit raises instead of propagating into outputs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_debug_nans", True)
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp


def main():
    from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
    from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
    from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from upscale_a_video_tpu.pipeline.pipeline import (
        PipelineModules, VideoUpscalePipeline)
    from upscale_a_video_tpu.sampling import (
        DDIMScheduler, DDIMSchedulerConfig, DDPMScheduler)

    unet_cfg = UNetVideoConfig(block_out_channels=(8, 16, 16, 32),
                               attention_head_dim=4, norm_num_groups=4,
                               cross_attention_dim=16)
    vae_cfg = VaeConfig(block_out_channels=(8, 16, 16), norm_num_groups=4)
    clip_cfg = CLIPTextConfig(hidden_size=16, intermediate_size=32,
                              num_hidden_layers=2, num_attention_heads=2)

    unet = UNetVideoModel(unet_cfg)
    vae = AutoencoderKLVideo(vae_cfg)
    clip = CLIPTextModel(clip_cfg)

    key = jax.random.PRNGKey(0)
    unet_params = unet.init(key, jnp.zeros((1, 2, 8, 8, 4)), 0,
                            jnp.zeros((1, 2, 8, 8, 3)),
                            jnp.zeros((1, 3, 16)), 0)
    vae_params = vae.init(key, jnp.zeros((1, 1, 8, 8, 3)))
    clip_params = clip.init(key, jnp.zeros((1, 77), jnp.int32))

    class Tok:
        def __call__(self, prompts):
            import numpy as np
            ids = np.full((len(prompts), 77), 42, np.int32)
            ids[:, 0] = 0
            return ids

    pipe = VideoUpscalePipeline(PipelineModules(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=clip, text_params=clip_params, tokenizer=Tok(),
        scheduler=DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear")),
        low_res_scheduler=DDPMScheduler()), dtype=jnp.float32)

    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 10, 8, 8, 3),
                             jnp.float32, -1, 1)
    flows = (jnp.zeros((1, 9, 8, 8, 2)), jnp.zeros((1, 9, 8, 8, 2)))
    out = pipe("smoke", img, flows_bi=flows, num_inference_steps=3,
               guidance_scale=4.0, noise_level=100, propagation_steps=(1,))
    assert out.shape == (1, 10, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())
    print("nan-smoke OK: tiny e2e pipeline finite under jax_debug_nans")


if __name__ == "__main__":
    main()
