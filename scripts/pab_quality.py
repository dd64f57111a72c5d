"""PAB quality bound (VERDICT r2 weak #3): measure BOTH the e2e speedup AND
the output delta of Pyramid Attention Broadcast at the bench config, on-chip.

PAB reuses stale attention deltas across denoise steps — an approximation.
This script runs the full pipeline twice with identical non-zero random
weights and the same seed (PAB off vs PAB kinds=cross), times both, and
reports PSNR / mean-abs-delta between the two decoded outputs plus their
fps. The quality number contextualizes every PAB speedup claim.

Usage: python scripts/pab_quality.py [size] [frames]   (defaults 256 8)
Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "UAV_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
STEPS = 30


def build(pab):
    from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
    from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
    from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from upscale_a_video_tpu.pipeline.pipeline import (PABConfig,
                                                       PipelineModules,
                                                       VideoUpscalePipeline)
    from upscale_a_video_tpu.sampling import (DDIMScheduler,
                                              DDIMSchedulerConfig,
                                              DDPMScheduler)
    from upscale_a_video_tpu.utils.param_init import fast_init

    unet_cfg = UNetVideoConfig.from_json(
        "/root/reference/configs/unet_video_config.json")
    vae_cfg = VaeConfig.from_json("/root/reference/configs/vae_3d_config.json")
    unet = UNetVideoModel(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKLVideo(vae_cfg, dtype=jnp.bfloat16)
    clip = CLIPTextModel(CLIPTextConfig(), dtype=jnp.bfloat16)

    # REAL (non-zero) random weights — zeros would hide any quality delta
    unet_params = fast_init(unet, jnp.zeros((1, 2, 32, 32, 4), jnp.bfloat16),
                            0, jnp.zeros((1, 2, 32, 32, 3), jnp.bfloat16),
                            jnp.zeros((1, 77, 1024), jnp.bfloat16), 0,
                            zeros=False)
    vae_params = fast_init(vae, jnp.zeros((1, 1, 32, 32, 3), jnp.bfloat16),
                           seed=1, zeros=False)
    clip_params = fast_init(clip, jnp.zeros((1, 77), dtype=jnp.int32), seed=2,
                            zeros=False)

    class FixedTokenizer:
        def __call__(self, prompts):
            ids = np.full((len(prompts), 77), 49407, dtype=np.int32)
            ids[:, 0] = 49406
            ids[:, 1] = 1000
            return ids

    modules = PipelineModules(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=clip, text_params=clip_params, tokenizer=FixedTokenizer(),
        scheduler=DDIMScheduler(
            DDIMSchedulerConfig(beta_schedule="scaled_linear")),
        low_res_scheduler=DDPMScheduler(),
    )
    return VideoUpscalePipeline(
        modules, dtype=jnp.bfloat16, decode_dtype=jnp.bfloat16,
        pab=PABConfig(kinds=("cross",)) if pab else None)


def run(pipe, img):
    def once():
        out = pipe("bench", img, num_inference_steps=STEPS,
                   guidance_scale=6.0, noise_level=120,
                   key=jax.random.PRNGKey(10))
        np.asarray(out[0, 0, 0, 0])
        return out

    t0 = time.time()
    out = once()
    print(f"  compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    out = once()
    dt = time.time() - t0
    return np.asarray(out, np.float32), FRAMES / dt


def main():
    img = jax.random.uniform(jax.random.PRNGKey(1),
                             (1, FRAMES, SIZE, SIZE, 3), jnp.float32, -1, 1)
    print("[pab off]", file=sys.stderr)
    ref, fps_off = run(build(pab=False), img)
    print("[pab on: kinds=cross]", file=sys.stderr)
    out, fps_on = run(build(pab=True), img)

    diff = out - ref
    mse = float(np.mean(diff ** 2))
    psnr = float(10 * np.log10(4.0 / mse)) if mse > 0 else float("inf")
    print(json.dumps({
        "config": f"{SIZE}x{SIZE} T={FRAMES} {STEPS} steps CFG, "
                  f"PAB kinds=cross vs off, random weights, seed 10",
        "fps_off": round(fps_off, 4),
        "fps_on": round(fps_on, 4),
        "speedup": round(fps_on / fps_off, 4),
        "psnr_on_vs_off_db": round(psnr, 2),
        "mean_abs_delta": round(float(np.mean(np.abs(diff))), 6),
        "max_abs_delta": round(float(np.max(np.abs(diff))), 4),
        "output_range": [float(ref.min()), float(ref.max())],
    }))


if __name__ == "__main__":
    main()
