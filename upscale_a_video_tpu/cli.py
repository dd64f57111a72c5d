"""Command-line driver, argv-compatible with the reference
(`/root/reference/inference_upscale_a_video.py:64-90`).

    python -m upscale_a_video_tpu.cli -i input.mp4 -o results \\
        -n 120 -g 6 -s 30 -p 24,26,28 --use_video_vae --color_fix Wavelet

Differences from the reference driver, by design:
- runs on TPU via JAX; no CUDA device juggling (the captioner is a pluggable
  backend instead of a second GPU)
- deterministic threefry seed (--seed, default 10 as the reference's
  fixed generator seed at :197)
- tiles/chunks execute as jitted programs (one compile per tile geometry)
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List, Optional

import numpy as np


def str_to_list(s: str) -> List[int]:
    return [int(x) for x in s.split(",")] if s else []


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("upscale-a-video-tpu")
    p.add_argument("-i", "--input_path", type=str, default="./inputs")
    p.add_argument("-o", "--output_path", type=str, default="./results")
    p.add_argument("-n", "--noise_level", type=int, default=120)
    p.add_argument("-g", "--guidance_scale", type=float, default=6)
    p.add_argument("-s", "--inference_steps", type=int, default=30)
    p.add_argument("-p", "--propagation_steps", type=str_to_list, default=[])
    p.add_argument("--a_prompt", type=str, default="best quality, extremely detailed")
    p.add_argument("--n_prompt", type=str, default="blur, worst quality")
    p.add_argument("--use_video_vae", action="store_true", default=False)
    p.add_argument("--color_fix", type=str, default="None",
                   choices=["None", "AdaIn", "Wavelet"])
    p.add_argument("--no_llava", action="store_true", default=False)
    p.add_argument("--load_8bit_llava", action="store_true", default=False)
    p.add_argument("--perform_tile", action="store_true", default=False)
    p.add_argument("--tile_size", type=int, default=256)
    p.add_argument("--tile_batch", type=int, default=1,
                   help="tiles batched per pipeline call (TPU data parallelism)")
    p.add_argument("--save_image", action="store_true", default=False)
    p.add_argument("--save_suffix", type=str, default="")
    # TPU-specific additions
    p.add_argument("--model_dir", type=str,
                   default="./pretrained_models/upscale_a_video")
    p.add_argument("--random_weights", action="store_true", default=False,
                   help="random-init models (smoke testing without weights)")
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--max_frames", type=int, default=0,
                   help="process only the first N frames of each clip "
                        "(0 = all; smoke runs / CI)")
    p.add_argument("--max_size", type=int, default=0,
                   help="area-downsample inputs whose long side exceeds this "
                        "(0 = only the reference's >=1280^2 rule applies)")
    p.add_argument("--decode_fp32", action="store_true", default=False,
                   help="decode VAE in fp32 (reference parity); default bf16")
    p.add_argument("--decode_attn", type=str, default="bf16",
                   choices=("fp32", "bf16"),
                   help="fp32-decode mid-attention operand storage. The TPU "
                        "MXU truncates f32 matmul operands to bf16 per pass "
                        "anyway (measured rel-err vs f64: 4.6e-3 f32 vs "
                        "5.1e-3 bf16 — same class; softmax/accum stay f32), "
                        "so bf16 operands are the default (~18%% faster "
                        "decode); fp32 keeps f32 operand storage")
    p.add_argument("--w_lr", type=float, default=1.0)
    return p


def resolve_compile_cache_dir(environ=None) -> Optional[str]:
    """Pick the persistent compile-cache dir, or None when opted out.

    UAV_NO_COMPILE_CACHE=1 opts out ("" and "0" keep the cache on);
    UAV_COMPILE_CACHE overrides the location. Default is the repo-checkout
    `.jax_cache` next to the package; for a site-packages install that dir
    is unwritable, so fall back to a per-user cache under ~/.cache.
    """
    env = os.environ if environ is None else environ
    if env.get("UAV_NO_COMPILE_CACHE", "") not in ("", "0"):
        return None
    cache = env.get(
        "UAV_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        writable = os.access(cache, os.W_OK)
    except OSError:
        writable = False
    if not writable:
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "upscale_a_video_tpu",
            "jax_cache")
        os.makedirs(cache, exist_ok=True)
    return cache


def run(args) -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the CLI compiles one program per tile/window
    # geometry; without this every invocation recompiles through the (flaky,
    # slow) remote-compile path. Same cache dir as bench.py so demo runs
    # reuse the bench stages' programs.
    cache = resolve_compile_cache_dir()
    if cache is not None:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from .models.raft import load_raft, compute_bidirectional_flows
    from .ops.resize import resize_2d
    from .pipeline.color import apply_color_fix
    from .pipeline.loader import load_pipeline
    from .pipeline.tiling import needs_tiling, plan_tiles
    from .utils import video_io

    print("Loading Upscale-A-Video (TPU)")
    decode_dtype = jnp.float32 if args.decode_fp32 else jnp.bfloat16
    if getattr(args, "decode_attn", "bf16") == "fp32":
        # trace-time gate read by nn.attention.SpatialAttentionBlock
        os.environ["UAV_VAE_ATTN_F32"] = "1"
    # --random_weights still honors an existing model_dir for CONFIGS (tiny
    # smoke bundles carry configs but no weights); weights stay random-init
    model_dir = args.model_dir if os.path.isdir(args.model_dir) else None
    pipeline = load_pipeline(
        model_dir,
        use_video_vae=args.use_video_vae,
        decode_dtype=decode_dtype,
        random_init=args.random_weights,
    )

    raft = None
    if args.propagation_steps:
        raft_path = os.path.join(args.model_dir, "propagator/raft-things.pth")
        raft = load_raft(raft_path if os.path.exists(raft_path) else None)

    captioner = None
    if not args.no_llava:
        from .captioner import build_captioner

        captioner = build_captioner(load_8bit=args.load_8bit_llava)

    # resolve inputs (ref :139-150)
    ip = args.input_path
    if ip.endswith(video_io.VIDEO_EXTENSIONS):
        video_list = [ip]
    elif os.path.isdir(ip) and any(
        f.endswith(video_io.IMAGE_EXTENSIONS) for f in os.listdir(ip)
    ):
        video_list = [ip]
    elif os.path.isdir(ip):
        video_list = video_io.get_video_paths(ip)
    else:
        raise ValueError(f"invalid input: {ip}")

    # decode lookahead: read clip k+1 on a host thread while the TPU runs
    # clip k (the ring-buffer streamer covers fixed-shape eval; CLI inputs
    # vary in geometry, so a one-clip future is the right unit here)
    from concurrent.futures import ThreadPoolExecutor

    decode_pool = ThreadPoolExecutor(max_workers=1)
    pending = decode_pool.submit(video_io.read_video, video_list[0])

    for vi, video_path in enumerate(video_list):
        frames_u8, fps, name = pending.result()
        if args.max_frames:
            frames_u8 = frames_u8[:args.max_frames]
        if vi + 1 < len(video_list):
            pending = decode_pool.submit(video_io.read_video, video_list[vi + 1])
        tag = f"[{vi + 1}/{len(video_list)}]"
        print(f"{tag} Processing video: {name}")

        caption = ""
        if captioner is not None:
            caption = captioner(frames_u8[0])
            print(f"        Caption: {caption}")
        prompt = caption + args.a_prompt

        frames = video_io.to_model_range(frames_u8)  # (T, H, W, 3) [-1,1]
        h, w = frames.shape[1:3]
        if h >= 1280 and w >= 1280:  # ref :184-185
            frames = np.asarray(
                resize_2d(jnp.asarray(frames), (h // 4, w // 4), "area")
            )
            h, w = frames.shape[1:3]
        if args.max_size and max(h, w) > args.max_size:
            # smoke-run knob: area-downsample so the long side == max_size
            # (same resample as the ref's >=1280^2 rule, arbitrary cap)
            s = args.max_size / max(h, w)
            nh, nw = max(8, int(h * s)) // 8 * 8, max(8, int(w * s)) // 8 * 8
            frames = np.asarray(resize_2d(jnp.asarray(frames), (nh, nw), "area"))
            h, w = frames.shape[1:3]

        video = jnp.asarray(frames)[None]  # (1, T, H, W, 3)
        t = video.shape[1]

        # long clips: one device dispatch per denoise step (the T>8 window
        # plan in a single 30-step scan dispatch exceeds per-dispatch
        # execution watchdogs, and the all-windows-batched UNet call at
        # real sizes exceeds one chip's HBM — bench.py uses the same mode
        # for the T=32 headline). Short clips keep the one-program scan.
        if t > 8 and hasattr(pipeline, "step_mode"):
            pipeline.step_mode = "host"
            pipeline.window_group = 1

        flows_bi = None
        if raft is not None:
            if hasattr(pipeline, "compute_flows"):
                # sharded pipeline: data-parallel RAFT over its mesh
                flows_bi = pipeline.compute_flows(raft, video)
            else:
                flows_bi = compute_bidirectional_flows(raft, video)

        key = jax.random.PRNGKey(args.seed)
        start_time = time.time()

        do_tile = args.perform_tile or needs_tiling(h, w)
        common = dict(
            num_inference_steps=args.inference_steps,
            guidance_scale=args.guidance_scale,
            noise_level=args.noise_level,
            negative_prompt=args.n_prompt,
            propagation_steps=args.propagation_steps,
            key=key,
            w_lr=args.w_lr,
        )
        if do_tile:
            from .pipeline.tiled_run import run_tiled

            n_tiles = len(plan_tiles(h, w, args.tile_size, 64))
            print(f"{tag} Processing the video w/ {n_tiles} tile patches...")
            output = run_tiled(pipeline, prompt, video, flows_bi=flows_bi,
                               tile_size=args.tile_size, overlap=64,
                               tile_batch=args.tile_batch, **common)
        else:
            print(f"{tag} Processing the video w/o tile...")
            output = np.asarray(pipeline(prompt, video, flows_bi=flows_bi, **common))

        if args.color_fix in ("AdaIn", "Wavelet"):
            # frame-chunked: the single-call form OOMs the chip at large
            # output geometries (apply_color_fix docstring)
            output = apply_color_fix(args.color_fix, output[0], video[0])[None]

        run_time = time.time() - start_time

        prop = "_p" + "_".join(map(str, args.propagation_steps)) \
            if args.propagation_steps else ""
        suffix = "_" + args.save_suffix if args.save_suffix else ""
        g = args.guidance_scale
        g_str = str(int(g)) if float(g).is_integer() else str(g)
        save_name = f"{name}_n{args.noise_level}_g{g_str}_s{args.inference_steps}{prop}{suffix}"

        out_u8 = video_io.from_model_range(output[0])
        if args.save_image:
            video_io.write_frames(
                os.path.join(args.output_path, "frame", save_name), out_u8
            )
        video_io.write_video(
            os.path.join(args.output_path, "video", f"{save_name}.mp4"), out_u8, fps
        )
        print(f"{tag} Saved. time (sec): {run_time:.2f}\n")

    decode_pool.shutdown(wait=False)


def main(argv: Optional[List[str]] = None) -> None:
    args = build_parser().parse_args(argv)
    run(args)


if __name__ == "__main__":
    main()
