"""Compile-time peak-HBM gate for the flagship single-chip programs.

Lowers + compiles (never executes) the two programs the headline bench
dispatches at the flagship geometry (320², T=32, reference fp32 decode —
ref pipeline_upscale_a_video.py:601-635,668,685-700) and asserts each fits
the chip via ``compiled.memory_analysis()``:

  1. the fp32 3-frame VAE decode chunk — the program that OOM'd in
     BENCH_r03 (RESOURCE_EXHAUSTED) after a hot-path commit shipped
     without re-measuring;
  2. the host-stepped denoise step (window_group=1: lax.map over the 5
     unique T=32 windows, CFG shared-prefix).

Run on the real TPU (`make hbm-gate`) after ANY commit touching nn/, ops/,
models/vae.py, models/unet_video.py or pipeline/pipeline.py — this is the
gate that would have failed on round 3's commit 5046770 before it reached
the driver. Exits non-zero on breach.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BUDGET_GIB = 15.0   # chip HBM 15.75 GiB minus runtime/framework slack
GIB = 1 << 30


def live_gib(ma) -> float:
    return (getattr(ma, "temp_size_in_bytes", 0)
            + getattr(ma, "output_size_in_bytes", 0)
            + getattr(ma, "argument_size_in_bytes", 0)
            - getattr(ma, "alias_size_in_bytes", 0)) / GIB


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    size, frames, steps = 320, 32, 30
    failures = []

    # ---- program 1: fp32 3-frame decode chunk --------------------------
    pipe = bench.build_pipeline(fp32_decode=True)
    dec = pipe._build_decode(chunk_frames=3, w_lr=1.0)
    vae_params = pipe._stage_params(pipe.m.vae_params)
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    p_sds = jax.tree.map(lambda x: sds(x.shape, x.dtype), vae_params)
    ma = dec.lower(p_sds, sds((1, 3, size, size, 4), jnp.float32),
                   sds((1, 3, size, size, 3), jnp.float32)
                   ).compile().memory_analysis()
    g = live_gib(ma)
    print(f"[hbm-gate] fp32 3-frame decode @ {size}²: {g:.2f} GiB "
          f"(temp {ma.temp_size_in_bytes / GIB:.2f})", flush=True)
    if g > HBM_BUDGET_GIB:
        failures.append(f"decode {g:.2f} GiB > {HBM_BUDGET_GIB} GiB")

    # ---- program 2: T=32 host-mode denoise step ------------------------
    pipe.window_group = 1
    pipe.step_mode = "host"
    run_host = pipe._build_denoise((1, frames, size, size), steps, True, 6.0,
                                   (False,) * steps, False)
    step = run_host._step_jit
    unet_params = pipe._stage_params(pipe.m.unet_params)
    up_sds = jax.tree.map(lambda x: sds(x.shape, x.dtype), unet_params)
    ma = step.lower(
        up_sds,
        sds((1, frames, size, size, 4), jnp.float32),        # latents carry
        sds((2, frames, size, size, 3), jnp.bfloat16),       # image_noised
        sds((2, 77, 1024), jnp.bfloat16),                    # prompt embeds
        sds((2,), jnp.int32),                                # denoise level
        sds((1, frames - 1, 1, 1, 2), jnp.float32),          # dummy flows
        sds((1, frames - 1, 1, 1, 2), jnp.float32),
        (np.int32(500), np.bool_(False)),                    # (t, do_prop)
    ).compile().memory_analysis()
    g = live_gib(ma)
    print(f"[hbm-gate] T={frames} denoise step @ {size}²: {g:.2f} GiB "
          f"(temp {ma.temp_size_in_bytes / GIB:.2f})", flush=True)
    if g > HBM_BUDGET_GIB:
        failures.append(f"denoise step {g:.2f} GiB > {HBM_BUDGET_GIB} GiB")

    if failures:
        print("[hbm-gate] FAIL: " + "; ".join(failures), flush=True)
        return 1
    print("[hbm-gate] OK: both flagship programs fit "
          f"{HBM_BUDGET_GIB} GiB", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
