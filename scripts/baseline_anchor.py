"""Anchor the vs_baseline denominator (VERDICT r2 weak #4 / next #5).

The reference publishes no throughput numbers; ``bench.py``'s denominator is
a cost-model estimate (0.25 fps on H100 at 320²/T=32). This script replaces
pure estimation with two measured/derived anchors:

1. MEASURED: the reference's own torch UNet (full released config, built
   through tests/torch_shims, random init) forward at a scaled geometry on
   this host's CPU → achieved FLOP/s under torch. The same forward's FLOP
   count comes from XLA cost analysis of our architecturally-identical JAX
   UNet (utils/flops.cost_analysis), giving a framework-efficiency point:
   what fraction of hardware peak torch extracts on THIS workload.
2. DERIVED: an H100 roofline bracket for the reference e2e at the metric
   geometry (320², T=32, 30 steps, CFG, 8-frame windows stride 6, fp32
   3-frame decode): e2e fps = FLOPs / (989e12 · MFU), tabulated over the
   plausible MFU range, locating the 0.25 denominator inside it.

Usage: python scripts/baseline_anchor.py [--quick]   (quick: fewer reps)
Prints one JSON line; findings recorded in BASELINE.md.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests", "torch_shims"))
sys.path.insert(0, "/root/reference")

os.environ.setdefault("JAX_PLATFORMS", "cpu")

QUICK = "--quick" in sys.argv
B, T, HW = 2, 2, 64  # scaled geometry: CFG batch, 2 frames, 64²


def torch_measure():
    import torch

    import models_video.unet_video as ref_unet

    cfg = json.load(open("/root/reference/configs/unet_video_config.json"))
    cfg = {k: v for k, v in cfg.items() if not k.startswith("_")}
    torch.manual_seed(0)
    tm = ref_unet.UNetVideoModel.from_config(cfg).eval()
    n_params = sum(p.numel() for p in tm.parameters())

    sample = torch.randn(B, 4, T, HW, HW)
    low_res = torch.randn(B, 3, T, HW, HW)
    ctx = torch.randn(B, 77, 1024)
    lvl = torch.tensor([120] * B)

    with torch.no_grad():
        tm(sample, 500, low_res, encoder_hidden_states=ctx,
           class_labels=lvl)  # warm
        reps = 1 if QUICK else 3
        t0 = time.time()
        for _ in range(reps):
            tm(sample, 500, low_res, encoder_hidden_states=ctx,
               class_labels=lvl)
        dt = (time.time() - t0) / reps
    return dt, n_params


def jax_flops():
    import jax
    import jax.numpy as jnp

    from upscale_a_video_tpu.config import UNetVideoConfig
    from upscale_a_video_tpu.models import UNetVideoModel
    from upscale_a_video_tpu.utils.flops import flops_of
    from upscale_a_video_tpu.utils.param_init import fast_init

    cfg = UNetVideoConfig.from_json(
        "/root/reference/configs/unet_video_config.json")
    unet = UNetVideoModel(cfg, dtype=jnp.float32)
    params = fast_init(unet, jnp.zeros((1, 2, 32, 32, 4)), 0,
                       jnp.zeros((1, 2, 32, 32, 3)),
                       jnp.zeros((1, 77, 1024)), 0, zeros=True)

    def fwd(p, s, lr, ctx):
        return unet.apply(p, s, jnp.int32(500), lr, ctx, jnp.int32(120))

    f_small = flops_of(fwd, params, jnp.zeros((B, T, HW, HW, 4)),
                       jnp.zeros((B, T, HW, HW, 3)), jnp.zeros((B, 77, 1024)))
    return f_small


def main():
    t_torch, n_params = torch_measure()
    f_small = jax_flops()
    gflops = f_small / 1e9
    achieved = f_small / t_torch / 1e9  # GFLOP/s

    # single-core AVX-512 fp32 peak on this host class: ~2 FMA pipes × 16
    # lanes × 2 flops × ~3 GHz ≈ 190 GFLOP/s; torch threads = 1 core here
    cpu_peak_gflops = 190.0
    cpu_mfu = achieved / cpu_peak_gflops

    # reference e2e FLOPs at the metric geometry (fp16 UNet):
    # per CFG window call at 320² = measured-by-XLA 110.5 TFLOP (256², T=8,
    # BASELINE.md) × (320/256)² ; 30 steps × 6 windows; decode ≈ +15%
    unet_tflop_320 = 110.5 * (320 / 256) ** 2
    e2e_tflop = 30 * 6 * unet_tflop_320 * 1.15
    h100_peak = 989.0  # dense fp16 TFLOP/s
    bracket = {
        f"mfu_{int(m * 100)}": round(32 / (e2e_tflop / (h100_peak * m)), 4)
        for m in (0.2, 0.3, 0.4, 0.5, 0.6)
    }

    print(json.dumps({
        "torch_cpu_forward_s": round(t_torch, 3),
        "geometry": f"B{B} T{T} {HW}x{HW}",
        "unet_params": n_params,
        "window_gflops": round(gflops, 1),
        "torch_cpu_achieved_gflops": round(achieved, 2),
        "torch_cpu_mfu": round(cpu_mfu, 3),
        "ref_e2e_tflop_320_T32": round(e2e_tflop, 0),
        "h100_fps_bracket_by_mfu": bracket,
        "denominator_0.25_fps_implies_mfu": round(
            0.25 * e2e_tflop / 32 / h100_peak, 3),
    }))


if __name__ == "__main__":
    main()
