"""Regenerate golden regression fixtures.

Run from the repo root:  python tests/golden/generate.py

Goldens pin the numerical behavior of the core components (tiny configs,
fixed seeds) so refactors — kernel swaps, layout changes, fusion work — are
caught if they change numerics beyond tolerance. (The reference's released
weights are not in this environment, so cross-framework goldens live in a
separate converter-driven test once weights are present.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
from upscale_a_video_tpu.models.propagation import propagate_latents
from upscale_a_video_tpu.sampling import DDIMScheduler, DDIMSchedulerConfig

OUT = os.path.join(os.path.dirname(__file__), "goldens.npz")

TINY_UNET = UNetVideoConfig(
    block_out_channels=(8, 16, 16, 32), attention_head_dim=4,
    norm_num_groups=4, cross_attention_dim=16,
)
TINY_VAE = VaeConfig(block_out_channels=(8, 16, 16), norm_num_groups=4)


def main():
    out = {}

    # UNet forward
    unet = UNetVideoModel(TINY_UNET)
    sample = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16, 4))
    low_res = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16, 16, 3))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16))
    params = unet.init(jax.random.PRNGKey(0), sample, 10, low_res, ctx, 20)
    out["unet_fwd"] = np.asarray(unet.apply(params, sample, 500, low_res, ctx, 120))

    # VAE roundtrip
    vae = AutoencoderKLVideo(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 16, 16, 3))
    vparams = vae.init(jax.random.PRNGKey(4), x)
    out["vae_moments"] = np.asarray(vae.apply(vparams, x, method=vae.encode_moments))
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 2, 4, 4, 4))
    out["vae_decode"] = np.asarray(vae.apply(vparams, z, method=vae.decode))

    # DDIM 5-step chain (split step)
    sched = DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear"))
    ts = sched.timesteps(5)
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 8, 8, 4))
    for t in ts:
        eps = lat * 0.3
        v0 = sched.step_v0(eps, int(t), lat)
        lat = sched.step_vt(v0, eps, int(t), lat, 5)
    out["ddim_chain"] = np.asarray(lat)

    # propagation
    xp = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 8, 8, 4))
    ff = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 16, 16, 2)) * 2
    fb = jax.random.normal(jax.random.PRNGKey(10), (1, 3, 16, 16, 2)) * 2
    out["propagation"] = np.asarray(propagate_latents(xp, ff, fb))

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
