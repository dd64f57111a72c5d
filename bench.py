"""Benchmark: end-to-end 4× video upscale throughput on one chip.

Measures the flagship path — reference-config UNetVideo (bf16) + conditional
VAE decode — on a synthetic 8-frame clip, 30 DDIM steps with CFG (guidance 6),
noise level 120 (BASELINE.json config #1 semantics). Prints ONE JSON line.

Geometry: 256×256 LR → 1024×1024 output by default (a single reference tile —
the driver-level tile loop makes larger inputs a linear multiple of this).
An OOM/compile-timeout ladder falls back to smaller sizes; the reported
``vs_baseline`` scales the reference estimate to the measured geometry.

``vs_baseline``: the reference repo publishes no throughput numbers
(BASELINE.md), so the denominator is a cost-model estimate of the PyTorch
reference on H100: ~0.25 frames/s at 320² per chip (fp16 UNet, serial windows,
fp32 VAE decode) ⇒ 0.25·(320/size)² at other sizes. To be replaced by a
measured torch number when that stack is available.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent XLA compilation cache: first bench run pays the compile, later
# runs (driver re-runs, CI) start hot
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REF_BASELINE_FPS_320 = 0.25  # provisional H100 estimate; see module docstring

FRAMES = 8
STEPS = 30


def build_pipeline():
    from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
    from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
    from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from upscale_a_video_tpu.pipeline.pipeline import PipelineModules, VideoUpscalePipeline
    from upscale_a_video_tpu.sampling import (
        DDIMScheduler,
        DDIMSchedulerConfig,
        DDPMScheduler,
    )
    from upscale_a_video_tpu.utils.param_init import fast_init

    unet_cfg = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
    vae_cfg = VaeConfig.from_json("/root/reference/configs/vae_3d_config.json")
    clip_cfg = CLIPTextConfig()

    unet = UNetVideoModel(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKLVideo(vae_cfg, dtype=jnp.bfloat16)
    clip = CLIPTextModel(clip_cfg, dtype=jnp.bfloat16)

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
    # bf16 decode on TPU: bf16 has the fp32 exponent range, so the reference's
    # fp16-overflow workaround (pipeline :666-681) is unnecessary
    return VideoUpscalePipeline(modules, dtype=jnp.bfloat16, decode_dtype=jnp.bfloat16)


def run(pipe, size):
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, FRAMES, size, size, 3),
                             jnp.float32, -1, 1)
    t0 = time.time()
    out = pipe("bench", img, num_inference_steps=STEPS, guidance_scale=6.0,
               noise_level=120)
    out.block_until_ready()
    print(f"[{size}] compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    out = pipe("bench", img, num_inference_steps=STEPS, guidance_scale=6.0,
               noise_level=120)
    out.block_until_ready()
    dt = time.time() - t0
    assert out.shape == (1, FRAMES, size * 4, size * 4, 3)
    return FRAMES / dt


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [256, 192, 128]
    pipe = build_pipeline()
    fps, size = None, None
    for attempt in sizes:
        try:
            fps = run(pipe, attempt)
            size = attempt
            break
        except Exception as e:  # OOM fallback ladder
            print(f"bench at {attempt} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if fps is None:
        print(json.dumps({"metric": "error", "value": 0,
                          "unit": "frames/sec/chip", "vs_baseline": 0}))
        return

    ref_fps = REF_BASELINE_FPS_320 * (320.0 / size) ** 2
    result = {
        "metric": f"e2e 4x upscale {size}x{size}->{4 * size}x{4 * size}, "
                  f"{STEPS} DDIM steps + CFG + VAE decode, frames/sec/chip",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / ref_fps, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
