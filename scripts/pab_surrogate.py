"""PAB quality bound on a NON-RANDOM surrogate (VERDICT r3 item 7).

Round 3 measured PAB's stale-delta cost with random-init weights: 22.8 dB
PSNR vs exact at +3.5% e2e. Random attention is a pessimistic proxy — PAB's
premise (CV-filtered attention deltas drift slowly across adjacent denoise
steps, PAPERS.md: Pyramid Attention Broadcast) only holds for *trained*
attention. The released checkpoints are not in this environment, so this
script manufactures the cheapest meaningful stand-in:

1. build the FULL reference-config UNet (all params trainable, not just the
   temporal mask) and finetune it for a few hundred steps on smooth
   synthetic video latents with the real epsilon-prediction upscaler
   objective (training/train_unet.py, ref unet_video.py:577-601 regime);
2. run the full 256^2 T=8 pipeline twice with those weights — PAB off vs
   PAB kinds=cross — same seed, and report fps + PSNR exactly like
   scripts/pab_quality.py.

A few hundred steps does not make a good denoiser, but it does make the
attention maps input-dominated instead of chaotic, which is the property PAB
exploits. The resulting bound is labeled "surrogate-trained"; the honest
bound for release weights still requires the release weights.

Usage: python scripts/pab_surrogate.py [train_steps] [size] [frames]
       (defaults 300 256 8)
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

TRAIN_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
assert TRAIN_STEPS >= 1, "surrogate needs at least one train step"
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 256
FRAMES = int(sys.argv[3]) if len(sys.argv) > 3 else 8
STEPS = 30
LAT = 32  # training latent side; small keeps fwd+bwd ~sub-second on-chip


def smooth_video(key, shape, dtype=jnp.float32):
    """Low-frequency moving field: upsampled coarse noise + temporal drift.

    Gives the denoiser structured targets (and the conditioning branch
    structured inputs) so attention locks onto content instead of noise.
    """
    b, t, h, w, c = shape
    k1, k2 = jax.random.split(key)
    coarse = jax.random.normal(k1, (b, t, h // 8, w // 8, c), dtype)
    fine = jax.image.resize(coarse, shape, "linear")
    # temporal smoothing: EMA along t so adjacent frames correlate
    def ema(carry, x):
        y = 0.8 * carry + 0.2 * x
        return y, y
    _, sm = jax.lax.scan(ema, fine[:, 0], jnp.moveaxis(fine, 1, 0))
    out = jnp.moveaxis(sm, 0, 1)
    return jnp.tanh(out * (1.0 + 0.1 * jax.random.normal(k2, (), dtype)))


def main():
    import optax

    from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
    from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
    from upscale_a_video_tpu.models.clip_text import (CLIPTextConfig,
                                                      CLIPTextModel)
    from upscale_a_video_tpu.pipeline.pipeline import (PABConfig,
                                                       PipelineModules,
                                                       VideoUpscalePipeline)
    from upscale_a_video_tpu.sampling import (DDIMScheduler,
                                              DDIMSchedulerConfig,
                                              DDPMScheduler)
    from upscale_a_video_tpu.training.train_unet import (init_optimizer,
                                                         make_train_step)
    from upscale_a_video_tpu.utils.param_init import fast_init

    unet_cfg = UNetVideoConfig.from_json(
        "/root/reference/configs/unet_video_config.json")
    vae_cfg = VaeConfig.from_json("/root/reference/configs/vae_3d_config.json")
    unet = UNetVideoModel(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKLVideo(vae_cfg, dtype=jnp.bfloat16)
    clip = CLIPTextModel(CLIPTextConfig(), dtype=jnp.bfloat16)

    unet_params = fast_init(unet, jnp.zeros((1, 2, 32, 32, 4), jnp.bfloat16),
                            0, jnp.zeros((1, 2, 32, 32, 3), jnp.bfloat16),
                            jnp.zeros((1, 77, 1024), jnp.bfloat16), 0,
                            zeros=False)
    vae_params = fast_init(vae, jnp.zeros((1, 1, 32, 32, 3), jnp.bfloat16),
                           seed=1, zeros=False)
    clip_params = fast_init(clip, jnp.zeros((1, 77), dtype=jnp.int32), seed=2,
                            zeros=False)

    # ---- surrogate finetune: ALL params trainable (PAB caches cross/spatial
    # attention too, which the reference's temporal-only mask would freeze) --
    sched = DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear"))
    lr_sched = DDPMScheduler()
    opt = optax.adam(2e-5)  # no weight decay: short horizon, keep it stable
    train_step = make_train_step(unet, sched, lr_sched, optimizer=opt,
                                 freeze_non_temporal=False)
    opt_state = init_optimizer(unet_params, optimizer=opt,
                               freeze_non_temporal=False)

    # Train on the SAME conditioning the eval sees (advisor r4 medium):
    # PAB kinds=('cross',) caches exactly the cross-attention deltas, so the
    # slow-drift property must be established on the embeddings the cached
    # attention actually attends to — the CLIP-encoded FixedTokenizer ids —
    # not on an unrelated random embedding.
    class FixedTokenizer:
        def __call__(self, prompts):
            ids = np.full((len(prompts), 77), 49407, dtype=np.int32)
            ids[:, 0] = 49406
            ids[:, 1] = 1000
            return ids

    eval_ids = jnp.asarray(FixedTokenizer()(["bench"]))
    text_embeds = jnp.asarray(
        clip.apply(clip_params, eval_ids), jnp.bfloat16)

    key = jax.random.PRNGKey(42)

    t0 = time.time()
    loss0 = lossN = None
    params = unet_params
    for i in range(TRAIN_STEPS):
        key, k_b, k_s = jax.random.split(key, 3)
        k_lat, k_lr = jax.random.split(k_b)
        batch = {
            "latents": smooth_video(k_lat, (1, FRAMES, LAT, LAT, 4)),
            "low_res": smooth_video(k_lr, (1, FRAMES, LAT, LAT, 3)),
            "text_embeds": text_embeds,
        }
        params, opt_state, loss = train_step(params, opt_state, batch, k_s)
        lossN = float(loss)
        if i == 0:
            loss0 = lossN
            print(f"  step 0 loss {loss0:.4f} "
                  f"(compile {time.time() - t0:.0f}s)", file=sys.stderr)
        elif i % 50 == 0 or i == TRAIN_STEPS - 1:
            print(f"  step {i} loss {lossN:.4f}", file=sys.stderr)
    del opt_state
    train_s = time.time() - t0

    # ---- PAB off vs on with the surrogate-trained UNet --------------------
    def build(pab):
        modules = PipelineModules(
            unet=unet, unet_params=params, vae=vae, vae_params=vae_params,
            text_encoder=clip, text_params=clip_params,
            tokenizer=FixedTokenizer(),
            scheduler=DDIMScheduler(
                DDIMSchedulerConfig(beta_schedule="scaled_linear")),
            low_res_scheduler=DDPMScheduler(),
        )
        return VideoUpscalePipeline(
            modules, dtype=jnp.bfloat16, decode_dtype=jnp.bfloat16,
            pab=PABConfig(kinds=("cross",)) if pab else None)

    def run(pipe):
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

    img = jax.random.uniform(jax.random.PRNGKey(1),
                             (1, FRAMES, SIZE, SIZE, 3), jnp.float32, -1, 1)
    print("[pab off]", file=sys.stderr)
    ref, fps_off = run(build(pab=False))
    print("[pab on: kinds=cross]", file=sys.stderr)
    out, fps_on = run(build(pab=True))

    diff = out - ref
    mse = float(np.mean(diff ** 2))
    psnr = float(10 * np.log10(4.0 / mse)) if mse > 0 else float("inf")
    print(json.dumps({
        "config": f"{SIZE}x{SIZE} T={FRAMES} {STEPS} steps CFG, PAB "
                  f"kinds=cross vs off, SURROGATE-TRAINED weights "
                  f"({TRAIN_STEPS} steps, all-param eps-MSE on smooth "
                  f"synthetic video, conditioned on the SAME CLIP-encoded "
                  f"FixedTokenizer embedding the eval uses), seed 10",
        "train_steps": TRAIN_STEPS,
        "train_loss_first": loss0,
        "train_loss_last": lossN,
        "train_wall_s": round(train_s, 1),
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
