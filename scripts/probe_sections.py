"""In-situ UNet step section costs via config ablations (TPU).

Times the full denoise step, then variants with (a) temporal modules removed,
(b) additionally all CrossAttn blocks replaced by plain blocks. Differences
give the *in-situ* cost of each section (standalone module timings miss
fusion/layout effects at the boundaries). Chained reps; scalar readback.
"""
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

import dataclasses

import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.config import UNetVideoConfig
from upscale_a_video_tpu.models import UNetVideoModel
from upscale_a_video_tpu.utils.param_init import fast_init

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = 4

base = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
variants = {
    "full": base,
    "no_temporal": dataclasses.replace(
        base, down_temporal_idx=(), up_temporal_idx=(), mid_temporal=False),
    "plain_blocks": dataclasses.replace(
        base, down_temporal_idx=(), up_temporal_idx=(), mid_temporal=False,
        down_block_types=("DownBlock3D",) * 4,
        up_block_types=("UpBlock3D",) * 4),
}

lat = jnp.zeros((2, 8, SIZE, SIZE, 4), jnp.bfloat16)
lr = jnp.zeros((2, 8, SIZE, SIZE, 3), jnp.bfloat16)
ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)

results = {}
for name, cfg in variants.items():
    unet = UNetVideoModel(cfg, dtype=jnp.bfloat16)
    params = fast_init(unet, jnp.zeros((1, 2, 32, 32, 4), jnp.bfloat16), 0,
                       jnp.zeros((1, 2, 32, 32, 3), jnp.bfloat16),
                       jnp.zeros((1, 77, 1024), jnp.bfloat16), 0, zeros=True)

    @jax.jit
    def step(p, x, lr, ctx):
        return unet.apply(p, x, jnp.int32(500), lr, ctx, jnp.int32(120))

    t0 = time.time()
    np.asarray(step(params, lat, lr, ctx)[0, 0, 0, 0])
    print(f"{name}: warm {time.time() - t0:.1f}s", flush=True)
    cur = lat
    t0 = time.time()
    for _ in range(REPS):
        cur = step(params, cur, lr, ctx)[..., :4]
    np.asarray(cur[0, 0, 0, 0])
    dt = (time.time() - t0) / REPS * 1e3
    results[name] = dt
    print(f"{name}: {dt:.1f} ms/step", flush=True)

full = results["full"]
no_t = results.get("no_temporal", full)
plain = results.get("plain_blocks", no_t)
print(f"\nsection costs (in-situ):")
print(f"  temporal modules: {full - no_t:.1f} ms")
print(f"  transformers:     {no_t - plain:.1f} ms")
print(f"  resblocks+glue:   {plain:.1f} ms")
