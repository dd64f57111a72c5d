"""A/B the denoise step: duplicated CFG batch vs cfg_dup shared prefix."""
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

from upscale_a_video_tpu.config import UNetVideoConfig
from upscale_a_video_tpu.models import UNetVideoModel
from upscale_a_video_tpu.utils.param_init import fast_init

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = 4

cfg = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
unet = UNetVideoModel(cfg, dtype=jnp.bfloat16)
params = fast_init(unet, jnp.zeros((1, 2, 32, 32, 4), jnp.bfloat16), 0,
                   jnp.zeros((1, 2, 32, 32, 3), jnp.bfloat16),
                   jnp.zeros((1, 77, 1024), jnp.bfloat16), 0, zeros=True)

lat1 = jnp.zeros((1, 8, SIZE, SIZE, 4), jnp.bfloat16)
lr1 = jnp.zeros((1, 8, SIZE, SIZE, 3), jnp.bfloat16)
ctx2 = jnp.zeros((2, 77, 1024), jnp.bfloat16)


@jax.jit
def step_dup(p, lat, lr, ctx):
    return unet.apply(p, jnp.concatenate([lat, lat]), jnp.int32(500),
                      jnp.concatenate([lr, lr]), ctx, jnp.int32(120))


@jax.jit
def step_share(p, lat, lr, ctx):
    return unet.apply(p, lat, jnp.int32(500), lr, ctx, jnp.int32(120),
                      cfg_dup=True)


for name, fn in (("dup", step_dup), ("share", step_share)):
    t0 = time.time()
    np.asarray(fn(params, lat1, lr1, ctx2)[0, 0, 0, 0])
    print(f"{name}: warm {time.time() - t0:.1f}s", flush=True)
    cur = lat1
    t0 = time.time()
    for _ in range(REPS):
        out = fn(params, cur, lr1, ctx2)
        cur = out[:1]  # chain: feed half of rep i's output into rep i+1
    np.asarray(cur[0, 0, 0, 0])
    print(f"{name}: {(time.time() - t0) / REPS * 1e3:.1f} ms/step", flush=True)
