"""A/B the CFG-shared prefix blocks standalone: batch 2 vs batch 1.

If batch-1 ≈ half of batch-2 here but the full-graph cfg_dup saves nothing,
the loss is scheduling/fusion at the graph level, not the blocks.
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

import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.nn.blocks import InflatedConv
from upscale_a_video_tpu.nn.unet_blocks import DownBlock3D
from upscale_a_video_tpu.nn.temporal import TemporalModule3D

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = 6
DT = jnp.bfloat16


import flax.linen as nn


class PrefixModule(nn.Module):
    @nn.compact
    def __call__(self, x, emb):
        x = InflatedConv(256, (3, 3), dtype=DT, name="conv_in")(x)
        x, _ = DownBlock3D(in_channels=256, out_channels=256,
                           temb_channels=1024, num_layers=2,
                           add_downsample=True, dtype=DT,
                           name="down0")(x, emb)
        x = TemporalModule3D(in_channels=256, temb_channels=1024,
                             dtype=DT, name="temp0")(x, emb)
        return x


mod = PrefixModule()
for b in (2, 1):
    x = jnp.zeros((b, 8, SIZE, SIZE, 7), DT)
    emb = jnp.zeros((b, 1024), DT)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x, emb)
    fn = jax.jit(lambda p, x, e: mod.apply(p, x, e))
    t0 = time.time()
    np.asarray(fn(params, x, emb)[0, 0, 0, 0])
    print(f"b={b}: warm {time.time() - t0:.1f}s", flush=True)
    # chained: output is (b, 8, S/2, S/2, 256); feed a resized slice back
    t0 = time.time()
    cur = x
    for _ in range(REPS):
        out = fn(params, cur, emb)
        cur = jnp.concatenate([out[..., :7], jnp.zeros(
            (b, 8, SIZE // 2, SIZE // 2, 0), DT)], axis=-1)
        cur = jnp.tile(cur, (1, 1, 2, 2, 1))  # back to SIZE
    np.asarray(cur[0, 0, 0, 0])
    dt = (time.time() - t0) / REPS * 1e3
    print(f"b={b}: {dt:.1f} ms (incl. chain glue)", flush=True)
