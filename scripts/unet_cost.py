import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
from upscale_a_video_tpu.config import UNetVideoConfig
from upscale_a_video_tpu.models import UNetVideoModel
from upscale_a_video_tpu.utils.param_init import fast_init
from upscale_a_video_tpu.utils.flops import cost_analysis, count_params, format_count

cfg = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
unet = UNetVideoModel(cfg, dtype=jnp.bfloat16)
p = fast_init(unet, jnp.zeros((1,2,32,32,4), jnp.bfloat16), 0,
              jnp.zeros((1,2,32,32,3), jnp.bfloat16),
              jnp.zeros((1,77,1024), jnp.bfloat16), 0, zeros=True)
print("params:", format_count(count_params(p)))
lat = jnp.zeros((2, 8, 256, 256, 4), jnp.bfloat16)
lr = jnp.zeros((2, 8, 256, 256, 3), jnp.bfloat16)
ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)
ca = cost_analysis(lambda p, a, b, c: unet.apply(p, a, jnp.int32(500), b, c, jnp.int32(120)), p, lat, lr, ctx)
fl = float(ca.get("flops", 0)); by = float(ca.get("bytes accessed", ca.get("bytes_accessed", 0)))
print("flops:", format_count(fl), " bytes:", format_count(by))
t = 1.0912
print(f"achieved: {fl/t/1e12:.1f} TFLOP/s = {fl/t/197e12*100:.1f}% of v5e bf16 peak; "
      f"HBM: {by/t/1e9:.0f} GB/s = {by/t/819e9*100:.1f}% of 819 GB/s")
