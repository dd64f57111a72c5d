"""Standalone UNet denoise-step timing probe (run on TPU hardware).

Writes progressive results to scripts/probe_unet.log; forces completion via
scalar readback (axon block_until_ready is unreliable)."""
import time, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
log = open(os.path.join(os.path.dirname(__file__), 'probe_unet.log'), 'w', buffering=1)
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

size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cfg = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
unet = UNetVideoModel(cfg, dtype=jnp.bfloat16)
params = fast_init(unet, jnp.zeros((1,2,32,32,4), jnp.bfloat16), 0,
                   jnp.zeros((1,2,32,32,3), jnp.bfloat16),
                   jnp.zeros((1,77,1024), jnp.bfloat16), 0, zeros=True)
log.write("init done\n")
lat = jnp.zeros((2,8,size,size,4), jnp.bfloat16)
lr = jnp.zeros((2,8,size,size,3), jnp.bfloat16)
ctx = jnp.zeros((2,77,1024), jnp.bfloat16)

@jax.jit
def step(p, lat, lr, ctx):
    return unet.apply(p, lat, jnp.int32(500), lr, ctx, jnp.int32(120))

t0=time.time(); np.asarray(step(params, lat, lr, ctx)[0,0,0,0]); log.write(f"warm {time.time()-t0:.1f}s\n")
for i in range(3):
    t0=time.time()
    np.asarray(step(params, lat, lr, ctx)[0,0,0,0])
    log.write(f"call{i} {time.time()-t0:.3f}s\n")
log.write("done\n")
