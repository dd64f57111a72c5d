"""Compile-only HBM probe for the fp32 VAE decode (3-frame chunk, 320²
latents → 1280² pixels — the flagship decode program that OOM'd in
BENCH_r03). Uses ``compiled.memory_analysis()`` so nothing runs on the chip.

Usage: python scripts/probe_decode_mem.py [--naive] [--size 320]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--naive" in sys.argv:
    os.environ["UAV_NO_SUBPIX_UP"] = "1"

import jax
import jax.numpy as jnp

from upscale_a_video_tpu.config import VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo
from upscale_a_video_tpu.utils.param_init import fast_init


def main():
    size = 320
    for a in sys.argv[1:]:
        if a.startswith("--size"):
            size = int(sys.argv[sys.argv.index(a) + 1])
    vae_cfg = VaeConfig.from_json("/root/reference/configs/vae_3d_config.json")
    vae = AutoencoderKLVideo(vae_cfg, dtype=jnp.float32)
    vparams = fast_init(vae, jnp.zeros((1, 1, 32, 32, 3), jnp.bfloat16),
                        seed=1, zeros=True)
    z = jax.ShapeDtypeStruct((1, 3, size, size, 4), jnp.float32)

    def decode(params, z):
        return vae.apply(params, z, method=vae.decode)

    lowered = jax.jit(decode).lower(vparams, z)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1 << 30
    print(f"size={size} naive={'--naive' in sys.argv}")
    for k in ("temp_size_in_bytes", "output_size_in_bytes",
              "argument_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"  {k}: {v / gb:.3f} GiB")
    tot = (getattr(ma, 'temp_size_in_bytes', 0)
           + getattr(ma, 'output_size_in_bytes', 0)
           + getattr(ma, 'argument_size_in_bytes', 0)
           - getattr(ma, 'alias_size_in_bytes', 0))
    print(f"  TOTAL live estimate: {tot / gb:.3f} GiB (chip: 15.75 GiB)")


if __name__ == "__main__":
    main()
