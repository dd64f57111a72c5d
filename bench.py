"""Benchmark: 4× video upscale throughput on one chip. Prints ONE JSON line.

Flagship path: reference-config UNetVideo (bf16) + conditional VAE decode,
30 DDIM steps with CFG (BASELINE.json config #1 semantics).

Stages (the parent runs each in a subprocess with a wall-clock budget and
falls back, so a slow compile through the TPU tunnel can't leave the driver
without a number):
    e2e <size> [fp32_decode] — whole pipeline (denoise scan + chunked
                   decode), measured; fp32_decode matches the reference's
                   forced-fp32 VAE decode (pipeline_upscale_a_video.py:668)
    e2e_pab      — same with Pyramid Attention Broadcast (approximate)
    components   — UNet denoise step and VAE 3-frame decode timed separately;
                   e2e time modeled as STEPS·t_unet + ceil(T/3)·t_dec (the
                   scan/blend overhead around them is negligible)

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
denominator is a cost-model estimate of the torch reference on H100:
0.25 frames/s at 320² on its ~32-frame eval clips. At other geometries the
model scales by pixels (·(320/size)²) and by UNet window work per frame
(T=32 runs 6 sliding windows for 32 frames = 1.5 window-batches per 8
frames vs 1.0 at T=8; the UNet is taken as 85% of reference e2e time —
see BASELINE.md). The headline stage runs the metric's own 320² geometry
with reference fp32 decode so vs_baseline is apples-to-apples.
"""

import functools
import json
import math
import os
import subprocess
import sys
import time

REF_BASELINE_FPS_320 = 0.25   # H100 fp16 torch reference at 320², T=32 (est.)
REF_UNET_FRACTION = 0.85      # UNet share of reference e2e (rest: decode+IO)
FRAMES = 8
STEPS = 30


def _windows_per_8_frames(t: int) -> float:
    """UNet window-batches per 8 frames under the reference plan
    (8-frame windows, stride 6, right-aligned duplicate tail — ref
    pipeline_upscale_a_video.py:601-635)."""
    if t <= 8:
        return 8.0 / t if t < 8 else 1.0
    n = len(range(0, t, 6))
    return n * 8.0 / t


def ref_fps_estimate(size: int, t: int) -> float:
    """Cost-model H100 reference fps at (size, T): pixel scaling plus the
    UNet window-overhead ratio vs the T=32 eval geometry."""
    unet_ratio = _windows_per_8_frames(t) / _windows_per_8_frames(32)
    time_ratio = REF_UNET_FRACTION * unet_ratio + (1 - REF_UNET_FRACTION)
    return REF_BASELINE_FPS_320 * (320.0 / size) ** 2 / time_ratio

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _setup_jax():
    import jax

    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    return jax


def build_pipeline(fp32_decode: bool = False):
    jax = _setup_jax()
    import jax.numpy as jnp

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

    unet = UNetVideoModel(unet_cfg, dtype=jnp.bfloat16)
    # the VAE module's own dtype must follow the decode precision — flax
    # modules cast inputs to their dtype, so a bf16-built VAE silently
    # downcasts an fp32 decode back to bf16
    vae = AutoencoderKLVideo(
        vae_cfg, dtype=jnp.float32 if fp32_decode else jnp.bfloat16)
    clip = CLIPTextModel(CLIPTextConfig(), dtype=jnp.bfloat16)

    t0 = time.time()
    unet_params = fast_init(unet, jnp.zeros((1, 2, 32, 32, 4), jnp.bfloat16), 0,
                            jnp.zeros((1, 2, 32, 32, 3), jnp.bfloat16),
                            jnp.zeros((1, 77, 1024), jnp.bfloat16), 0, zeros=True)
    vae_params = fast_init(vae, jnp.zeros((1, 1, 32, 32, 3), jnp.bfloat16), seed=1,
                           zeros=True)
    clip_params = fast_init(clip, jnp.zeros((1, 77), dtype=jnp.int32), seed=2,
                            zeros=True)
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
    return VideoUpscalePipeline(
        modules, dtype=jnp.bfloat16,
        decode_dtype=jnp.float32 if fp32_decode else jnp.bfloat16)


def _result(size: int, fps: float, note: str, t: int = FRAMES) -> dict:
    ref_fps = ref_fps_estimate(size, t)
    return {
        "metric": f"e2e 4x upscale {size}x{size}->{4 * size}x{4 * size}, "
                  f"T={t}, {STEPS} DDIM steps + CFG + VAE decode ({note}), "
                  f"frames/sec/chip",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / ref_fps, 3),
    }


def stage_e2e(size: int, pab: bool = False, fp32_decode: bool = False,
              frames: int = FRAMES) -> dict:
    jax = _setup_jax()
    import jax.numpy as jnp

    import numpy as np

    pipe = build_pipeline(fp32_decode=fp32_decode)
    if frames > 8:
        # the metric's own clip length (~32-frame YouHQ40 clips): run the
        # sliding windows one per call (lax.map) — group=2 at 320² needs
        # 18.3G HBM vs the chip's 15.75G — and host-step the denoise loop
        # so each device dispatch is one step (~n_win·1.3 s), far below the
        # axon tunnel's execution watchdog that kills the single-dispatch
        # 30-step scan (~4 min) at this geometry
        pipe.window_group = 1
        pipe.step_mode = "host"
    if pab:
        from upscale_a_video_tpu.pipeline.pipeline import PABConfig

        # cache ONLY the text cross-attention deltas (longest reuse range,
        # cross_range=6) at EVERY level: a fraction of the full cache's HBM
        # (full-kind caching at 256 exceeds one v5e's 16G)
        pipe.pab = PABConfig(kinds=("cross",))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, frames, size, size, 3),
                             jnp.float32, -1, 1)

    def run_once():
        out = pipe("bench", img, num_inference_steps=STEPS, guidance_scale=6.0,
                   noise_level=120)
        # force completion with a scalar readback — block_until_ready is
        # unreliable through the axon tunnel
        np.asarray(out[0, 0, 0, 0])
        return out

    t0 = time.time()
    out = run_once()
    print(f"[e2e {size}] compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    out = run_once()
    dt = time.time() - t0
    assert out.shape == (1, frames, size * 4, size * 4, 3)
    # "fp32 decode, bf16-operand attn": decode runs fp32 end-to-end except
    # the decoder's mid attention q/k/v operand STORAGE, which defaults to
    # bf16 (fp32 softmax/accum; UAV_VAE_ATTN_F32=1 restores f32 operands —
    # docs/PARITY.md "Decode precision"). The label keeps the vs_baseline
    # row self-describing.
    attn_note = (", fp32-operand attn" if os.environ.get("UAV_VAE_ATTN_F32")
                 else ", bf16-operand attn")
    note = "measured" + (", PAB" if pab else "") + \
        ((", fp32 decode" + attn_note) if fp32_decode else ", bf16 decode")
    return _result(size, frames / dt, note, t=frames)


def stage_components(size: int, fp32_decode: bool = False,
                     frames: int = FRAMES) -> dict:
    """Component-timed model. With ``frames`` > 8 the e2e model charges the
    reference window plan's ``n_win`` window-batches per step plus
    ceil(frames/3) decode chunks — used for geometries whose single-dispatch
    denoise scan exceeds the axon tunnel's execution watchdog (T=32 at 320²
    crashes the worker ~4 min into one dispatch; measured 2×)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
    from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
    from upscale_a_video_tpu.utils.param_init import fast_init

    unet_cfg = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
    vae_cfg = VaeConfig.from_json("/root/reference/configs/vae_3d_config.json")
    ddt = jnp.float32 if fp32_decode else jnp.bfloat16
    unet = UNetVideoModel(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKLVideo(vae_cfg, dtype=ddt)

    unet_params = fast_init(unet, jnp.zeros((1, 2, 32, 32, 4), jnp.bfloat16), 0,
                            jnp.zeros((1, 2, 32, 32, 3), jnp.bfloat16),
                            jnp.zeros((1, 77, 1024), jnp.bfloat16), 0, zeros=True)
    vae_params = fast_init(vae, jnp.zeros((1, 1, 32, 32, 3), jnp.bfloat16), seed=1,
                           zeros=True)

    # denoise step: CFG batch 2, one 8-frame window
    lat = jnp.zeros((2, FRAMES, size, size, 4), jnp.bfloat16)
    lr = jnp.zeros((2, FRAMES, size, size, 3), jnp.bfloat16)
    ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)

    @jax.jit
    def unet_step(params, lat, lr, ctx):
        return unet.apply(params, lat, jnp.int32(500), lr, ctx, jnp.int32(120))

    import numpy as np

    unet_step = functools.partial(unet_step, unet_params)
    np.asarray(unet_step(lat, lr, ctx)[0, 0, 0, 0])  # compile + warm
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = unet_step(lat, lr, ctx)
    # force full completion: device→host readback (block_until_ready is
    # unreliable through the axon tunnel)
    np.asarray(out[0, 0, 0, 0])
    t_unet = (time.time() - t0) / reps
    print(f"[components {size}] unet step: {t_unet * 1e3:.1f} ms", file=sys.stderr)

    # VAE decode: 3-frame chunk
    z = jnp.zeros((1, 3, size, size, 4), ddt)

    @jax.jit
    def decode(params, z):
        return vae.apply(params, z, method=vae.decode)

    decode = functools.partial(decode, vae_params)
    np.asarray(decode(z)[0, 0, 0, 0])
    t0 = time.time()
    for _ in range(reps):
        out = decode(z)
    np.asarray(out[0, 0, 0, 0])
    t_dec = (time.time() - t0) / reps
    print(f"[components {size}] vae 3-frame decode: {t_dec * 1e3:.1f} ms",
          file=sys.stderr)

    n_win = len(range(0, frames, 6)) if frames > 8 else 1
    total = STEPS * n_win * t_unet + math.ceil(frames / 3) * t_dec
    note = "component-timed model" + (", fp32 decode" if fp32_decode else "")
    return _result(size, frames / total, note, t=frames)


def main():
    args = sys.argv[1:]
    if args and args[0] == "--stage":
        stage = args[1]
        fp32 = "fp32" in args[3:]
        frames = next((int(a[1:]) for a in args[3:]
                       if a.startswith("T") and a[1:].isdigit()), FRAMES)
        if stage == "e2e":
            print(json.dumps(stage_e2e(int(args[2]), fp32_decode=fp32,
                                       frames=frames)))
        elif stage == "e2e_pab":
            print(json.dumps(stage_e2e(int(args[2]), pab=True,
                                       fp32_decode=fp32)))
        elif stage == "components":
            print(json.dumps(stage_components(int(args[2]), fp32_decode=fp32,
                                              frames=frames)))
        return

    # parent: try stages with wall-clock budgets, emit the first success.
    # Headline: the metric's own geometry (320², reference fp32 decode);
    # fallbacks keep round-1 continuity if the 320 compile exceeds budget.
    me = os.path.abspath(__file__)
    attempts = [
        # headline: the metric's own geometry — T=32 YouHQ40-length clip at
        # 320², reference fp32 decode, MEASURED end-to-end (host-stepped
        # denoise keeps every dispatch under the tunnel watchdog)
        (["--stage", "e2e", "320", "fp32", "T32"], 1500),
        (["--stage", "e2e", "320", "fp32"], 900),
        (["--stage", "e2e", "256"], 560),
        (["--stage", "components", "256"], 560),
        (["--stage", "components", "128"], 400),
    ]
    for stage_args, budget in attempts:
        try:
            proc = subprocess.run(
                [sys.executable, "-u", me, *stage_args],
                capture_output=True, text=True, timeout=budget,
            )
            sys.stderr.write(proc.stderr[-2000:])
            for line in proc.stdout.strip().splitlines():
                line = line.strip()
                if line.startswith("{"):
                    print(line)
                    return
        except subprocess.TimeoutExpired:
            print(f"stage {stage_args} exceeded {budget}s", file=sys.stderr)
    print(json.dumps({"metric": "error: all bench stages timed out", "value": 0,
                      "unit": "frames/sec/chip", "vs_baseline": 0}))


if __name__ == "__main__":
    main()
