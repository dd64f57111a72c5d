"""Benchmark: end-to-end 4× video upscale throughput on one chip.

Measures the flagship path — reference-config UNetVideo (bf16) + conditional
video VAE decode — on a synthetic 8-frame 320×320 clip, 30 DDIM steps with
CFG (guidance 6), noise level 120: BASELINE.json config #1 geometry
(320p → 1280p). Prints ONE JSON line.

``vs_baseline``: the reference repo publishes no throughput numbers
(BASELINE.md), so the denominator is a cost-model estimate of the PyTorch
reference on H100 (fp16 UNet, fp32 VAE, serial window/chunk loops):
~0.25 frames/sec — to be replaced by a measured number when the torch stack
is available.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

REF_BASELINE_FPS = 0.25  # provisional H100 estimate; see module docstring

FRAMES = 8
SIZE = 320
STEPS = 30


def build_pipeline(size):
    from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
    from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
    from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from upscale_a_video_tpu.pipeline.pipeline import PipelineModules, VideoUpscalePipeline
    from upscale_a_video_tpu.sampling import (
        DDIMScheduler,
        DDIMSchedulerConfig,
        DDPMScheduler,
    )

    unet_cfg = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
    vae_cfg = VaeConfig.from_json("/root/reference/configs/vae_3d_config.json")
    clip_cfg = CLIPTextConfig()

    unet = UNetVideoModel(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKLVideo(vae_cfg, dtype=jnp.bfloat16)
    clip = CLIPTextModel(clip_cfg, dtype=jnp.bfloat16)

    from upscale_a_video_tpu.utils.param_init import fast_init

    t0 = time.time()
    unet_params = fast_init(unet, jnp.zeros((1, 2, 32, 32, 4), jnp.bfloat16), 0,
                            jnp.zeros((1, 2, 32, 32, 3), jnp.bfloat16),
                            jnp.zeros((1, 77, 1024), jnp.bfloat16), 0)
    vae_params = fast_init(vae, jnp.zeros((1, 1, 32, 32, 3), jnp.bfloat16), seed=1)
    clip_params = fast_init(clip, jnp.zeros((1, 77), dtype=jnp.int32), seed=2)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    class FixedTokenizer:
        def __call__(self, prompts):
            import numpy as np
            ids = np.full((len(prompts), 77), 49407, dtype=np.int32)
            ids[:, 0] = 49406
            return ids

    modules = PipelineModules(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=clip, text_params=clip_params, tokenizer=FixedTokenizer(),
        scheduler=DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear")),
        low_res_scheduler=DDPMScheduler(),
    )
    # bf16 decode on TPU: bf16 has fp32 exponent range, so the reference's
    # fp16-overflow workaround (pipeline :666-681) is unnecessary
    return VideoUpscalePipeline(modules, dtype=jnp.bfloat16, decode_dtype=jnp.bfloat16)


def run(size):
    pipe = build_pipeline(size)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, FRAMES, size, size, 3),
                             jnp.float32, -1, 1)
    t0 = time.time()
    out = pipe("bench", img, num_inference_steps=STEPS, guidance_scale=6.0,
               noise_level=120)
    out.block_until_ready()
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    out = pipe("bench", img, num_inference_steps=STEPS, guidance_scale=6.0,
               noise_level=120)
    out.block_until_ready()
    dt = time.time() - t0
    return FRAMES / dt, dt


def main():
    size = SIZE
    for attempt_size in (SIZE, 256, 192, 128):
        try:
            fps, dt = run(attempt_size)
            size = attempt_size
            break
        except Exception as e:  # OOM fallback ladder
            print(f"bench at {attempt_size} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            fps = None
    if fps is None:
        print(json.dumps({"metric": "error", "value": 0, "unit": "frames/sec/chip",
                          "vs_baseline": 0}))
        return

    scale = (SIZE / size) ** 2  # normalize smaller fallback sizes to 320p cost
    result = {
        "metric": f"e2e 4x upscale {size}p, {STEPS} DDIM steps, CFG, frames/sec/chip",
        "value": round(fps / scale, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round((fps / scale) / REF_BASELINE_FPS, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
