"""Full-step kernel-class A/B at the flagship 320^2 geometry (run on TPU).

Round-4 tracing left ~110 ms of XLA layout copies around the Pallas-call
boundaries of the 1221 ms denoise step. Per-kernel microbenches
(ab_kernels_chained.py) show each fused kernel winning in isolation, but
isolation hides the relayout copies XLA inserts to satisfy a Pallas call's
default layout. This probe times the FULL jitted UNet step with one kernel
class disabled per variant: if a class is a net loss in context, disabling
it is a free headline win.

Usage: python scripts/ab_step_kernels.py [size] [variant]
  variant in {base, nocross, notemporal, noff, noresblock} — one per process
  (the UAV_NO_* switches are read at trace time, so each variant must be a
  fresh process). Appends one JSON line to scripts/ab_step_kernels.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": [],
    "nocross": ["UAV_NO_FUSED_CROSS"],
    "notemporal": ["UAV_NO_FUSED_TEMPORAL"],
    "noff": ["UAV_NO_FUSED_FF"],
    "noresblock": ["UAV_NO_FUSED_RESBLOCK"],
    "noff_nocross": ["UAV_NO_FUSED_FF", "UAV_NO_FUSED_CROSS"],
}

size = int(sys.argv[1]) if len(sys.argv) > 1 else 320
variant = sys.argv[2] if len(sys.argv) > 2 else "base"
for flag in VARIANTS[variant]:
    os.environ[flag] = "1"

out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ab_step_kernels.jsonl")

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

cfg = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
unet = UNetVideoModel(cfg, dtype=jnp.bfloat16)
params = fast_init(unet, jnp.zeros((1, 2, 32, 32, 4), jnp.bfloat16), 0,
                   jnp.zeros((1, 2, 32, 32, 3), jnp.bfloat16),
                   jnp.zeros((1, 77, 1024), jnp.bfloat16), 0, zeros=True)
lat = jnp.zeros((2, 8, size, size, 4), jnp.bfloat16)
lr = jnp.zeros((2, 8, size, size, 3), jnp.bfloat16)
ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)


@jax.jit
def step(p, lat, lr, ctx):
    return unet.apply(p, lat, jnp.int32(500), lr, ctx, jnp.int32(120))


t0 = time.time()
np.asarray(step(params, lat, lr, ctx)[0, 0, 0, 0])
compile_s = time.time() - t0
times = []
for _ in range(4):
    t0 = time.time()
    np.asarray(step(params, lat, lr, ctx)[0, 0, 0, 0])
    times.append(time.time() - t0)
rec = {"variant": variant, "size": size, "compile_s": round(compile_s, 1),
       "calls_s": [round(t, 4) for t in times],
       "best_s": round(min(times), 4)}
with open(out_path, "a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))
