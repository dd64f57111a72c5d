"""PAB quality with a NON-RANDOM weight surrogate (VERDICT r3 item 7).

The round-3 PAB quality bound (22.8 dB PSNR vs exact at +3.5% speed,
BENCH_LOCAL round3.pab_quality_256) was measured with RANDOM weights — a
pessimistic proxy, since PAB's premise is that *trained* attention maps
drift slowly across denoise steps while random attention is chaotic. The
released checkpoints don't exist in this environment, so this script builds
the cheapest meaningful surrogate:

  1. train a small UNet for N steps on synthetic structured video (moving
     sinusoid patterns, denoising-MSE objective, ALL params trainable);
  2. run the SAME 30-step CFG denoise twice (PAB kinds=cross vs exact) with
     the trained weights and with the random init, identical seeds;
  3. report latent-space PSNR(PAB, exact) for both.

If trained ≫ random, the random-weights bound materially understates PAB
and the feature stays available-but-off-headline; if trained ≈ random, PAB
freezes until real weights exist.

Usage: python scripts/pab_surrogate.py [train_steps]     (default 400)
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("UAV_TEST_CACHE", "/tmp/uav_test_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np
import optax

from upscale_a_video_tpu.config import UNetVideoConfig
from upscale_a_video_tpu.models import UNetVideoModel
from upscale_a_video_tpu.pipeline.pipeline import PABConfig
from upscale_a_video_tpu.sampling import (DDIMScheduler, DDIMSchedulerConfig,
                                          DDPMScheduler)
from upscale_a_video_tpu.training import make_train_step
from upscale_a_video_tpu.training.train_unet import init_optimizer

TRAIN_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
B, T, H, W = 4, 8, 32, 32
STEPS = 30
CFG_SCALE = 6.0

cfg = UNetVideoConfig(block_out_channels=(32, 64, 64, 128),
                      attention_head_dim=8, norm_num_groups=8,
                      cross_attention_dim=64, layers_per_block=1)
model = UNetVideoModel(cfg, dtype=jnp.float32)
sched = DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear"))
lr_sched = DDPMScheduler()


def synthetic_batch(key):
    """Moving sinusoid patterns: structured, temporally coherent video."""
    k1, k2, k3 = jax.random.split(key, 3)
    fx = jax.random.uniform(k1, (B, 1, 1, 1, 4), minval=0.5, maxval=3.0)
    fy = jax.random.uniform(k2, (B, 1, 1, 1, 4), minval=0.5, maxval=3.0)
    vel = jax.random.uniform(k3, (B, 1, 1, 1, 4), minval=-2.0, maxval=2.0)
    t = jnp.arange(T).reshape(1, T, 1, 1, 1) / T
    y = jnp.arange(H).reshape(1, 1, H, 1, 1) / H
    x = jnp.arange(W).reshape(1, 1, 1, W, 1) / W
    lat = jnp.sin(2 * jnp.pi * (fx * x + fy * y + vel * t))
    return {
        "latents": lat.astype(jnp.float32),
        "low_res": lat[..., :3].astype(jnp.float32),
        "text_embeds": jnp.tile(
            jax.random.normal(jax.random.PRNGKey(99), (1, 5, 64)), (B, 1, 1)),
    }


def denoise(params, pab):
    """30-step CFG denoise on one held-out clip; returns final latents."""
    key = jax.random.PRNGKey(123)
    klat, kimg = jax.random.split(key)
    clip = synthetic_batch(jax.random.PRNGKey(777))
    imgn = jnp.concatenate([clip["low_res"][:1]] * 2)
    emb = jnp.concatenate([jnp.zeros((1, 5, 64)), clip["text_embeds"][:1]])
    lvl = jnp.full((2,), 20, jnp.int32)
    lat = jax.random.normal(klat, (1, T, H, W, 4), jnp.float32)

    if pab is None:
        @jax.jit
        def step(lat, tt):
            pred = model.apply(params, jnp.concatenate([lat, lat]), tt,
                               imgn, emb, lvl).astype(jnp.float32)
            u, c = jnp.split(pred, 2)
            pred = u + CFG_SCALE * (c - u)
            x0 = sched.step_v0(pred, tt, lat)
            return sched.step_vt(x0, pred, tt, lat, STEPS)

        for tt in sched.timesteps(STEPS):
            lat = step(lat, jnp.int32(tt))
        return np.asarray(lat)

    flags = pab.use_cached_flags(STEPS)
    cache = model.make_pab_collect_cache(
        kinds=(None if set(pab.kinds) == {"spatial", "cross", "temporal"}
               else pab.kinds))
    shapes = jax.eval_shape(
        lambda: model.apply(params, jnp.zeros((2, T, H, W, 4)), jnp.int32(0),
                            imgn, emb, lvl, attn_cache=cache,
                            use_flags={"cross": False, "spatial": False,
                                       "temporal": False})[1])
    cache = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def step(lat, cache, tt, f_cross, f_spatial, f_temporal):
        pred, cache = model.apply(
            params, jnp.concatenate([lat, lat]), tt, imgn, emb, lvl,
            attn_cache=cache,
            use_flags={"cross": f_cross, "spatial": f_spatial,
                       "temporal": f_temporal})
        pred = pred.astype(jnp.float32)
        u, c = jnp.split(pred, 2)
        pred = u + CFG_SCALE * (c - u)
        x0 = sched.step_v0(pred, tt, lat)
        return sched.step_vt(x0, pred, tt, lat, STEPS), cache

    for i, tt in enumerate(sched.timesteps(STEPS)):
        lat, cache = step(lat, cache, jnp.int32(tt),
                          bool(flags["cross"][i]), bool(flags["spatial"][i]),
                          bool(flags["temporal"][i]))
    return np.asarray(lat)


def psnr(a, b):
    rng = float(a.max() - a.min()) or 1.0
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(rng * rng / mse) if mse else float("inf")


def pab_vs_exact(params):
    exact = denoise(params, None)
    approx = denoise(params, PABConfig(kinds=("cross",)))
    return psnr(exact, approx), float(np.mean(np.abs(exact - approx)))


def main():
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, H, W, 4)), 0,
        jnp.zeros((1, 2, H, W, 3)), jnp.zeros((1, 5, 64)), 0)

    t0 = time.time()
    psnr_rand, mad_rand = pab_vs_exact(params0)
    print(f"random-init PSNR(PAB,exact)={psnr_rand:.1f} dB "
          f"[{time.time() - t0:.0f}s]", file=sys.stderr)

    opt = optax.adamw(2e-4, weight_decay=1e-2)
    train = make_train_step(model, sched, lr_sched, opt,
                            freeze_non_temporal=False, donate=True)
    params, ostate = params0, init_optimizer(params0, opt,
                                             freeze_non_temporal=False)
    key = jax.random.PRNGKey(1)
    loss0 = lossN = None
    t0 = time.time()
    for i in range(TRAIN_STEPS):
        key, bkey, skey = jax.random.split(key, 3)
        params, ostate, loss = train(params, ostate, synthetic_batch(bkey),
                                     skey)
        if i == 0:
            loss0 = float(loss)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f}", file=sys.stderr)
    lossN = float(loss)
    print(f"trained {TRAIN_STEPS} steps in {time.time() - t0:.0f}s",
          file=sys.stderr)

    psnr_tr, mad_tr = pab_vs_exact(params)
    print(json.dumps({
        "config": f"surrogate UNet {cfg.block_out_channels}, {T}x{H}x{W}, "
                  f"{STEPS} steps CFG, PAB kinds=cross",
        "train_steps": TRAIN_STEPS,
        "loss_first": round(loss0, 4), "loss_last": round(lossN, 4),
        "psnr_random_init_db": round(psnr_rand, 2),
        "psnr_trained_db": round(psnr_tr, 2),
        "mean_abs_delta_random": round(mad_rand, 5),
        "mean_abs_delta_trained": round(mad_tr, 5),
    }))


if __name__ == "__main__":
    main()
