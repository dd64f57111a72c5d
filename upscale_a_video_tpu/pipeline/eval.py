"""Batch evaluation harness (YouHQ40-style, SURVEY §5.5/§6).

Runs the pipeline over a directory of clips with per-clip crash-safe resume
(utils/checkpoint.ClipLedger), computes PSNR/SSIM against ground-truth clips
when provided, and writes a JSONL report. This is the quality gate the
reference lacks in-repo (its paper metrics were computed externally).

Data-parallel scaling: clips are embarrassingly parallel — point N workers
(serving/worker.py) at disjoint shards, or run one process per host in a
multi-host job; the ledger file is per-shard.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Optional

import numpy as np


def evaluate_directory(
    pipeline,
    input_dir: str,
    output_dir: str,
    gt_dir: Optional[str] = None,
    num_inference_steps: int = 30,
    guidance_scale: float = 6.0,
    noise_level: int = 120,
    prompt: str = "best quality, extremely detailed",
    negative_prompt: str = "blur, worst quality",
    max_frames: Optional[int] = None,
    seed: int = 10,
    report_path: Optional[str] = None,
    lpips_ckpt: Optional[str] = None,
    lpips_net: str = "alex",
) -> dict:
    """Upscale every clip in input_dir; returns aggregate metrics.

    With ``lpips_ckpt`` (a torch ``lpips`` package checkpoint), per-clip and
    aggregate LPIPS are reported alongside PSNR/SSIM — the full BASELINE.md
    quality gate.
    """
    import jax
    import jax.numpy as jnp

    from ..utils import video_io
    from ..utils.checkpoint import ClipLedger
    from ..utils.metrics import psnr, ssim

    lpips_fn = None
    if lpips_ckpt is not None and gt_dir is not None:
        from ..utils.lpips import load_lpips

        lpips_model, lpips_params = load_lpips(lpips_ckpt, net=lpips_net)
        lpips_fn = jax.jit(lambda a, b: lpips_model.apply(lpips_params, a, b))

    report_path = report_path or os.path.join(output_dir, "eval_report.jsonl")
    ledger = ClipLedger(os.path.join(output_dir, "eval_ledger.jsonl"))

    clips = video_io.get_video_paths(input_dir)
    if not clips:
        raise ValueError(f"no clips in {input_dir}")

    # decode lookahead: read clip k+1 on a host thread while the TPU runs
    # clip k (shape-agnostic counterpart of the fixed-shape ring streamer in
    # utils/stream.py)
    from concurrent.futures import ThreadPoolExecutor

    todo = [c for c in clips if not ledger.is_done(Path(c).stem)]
    pool = ThreadPoolExecutor(max_workers=1)
    pending = pool.submit(video_io.read_video, todo[0]) if todo else None

    results = []
    for ci, clip_path in enumerate(todo):
        name = Path(clip_path).stem
        frames_u8, fps, _ = pending.result()
        if ci + 1 < len(todo):
            pending = pool.submit(video_io.read_video, todo[ci + 1])
        if max_frames:
            frames_u8 = frames_u8[:max_frames]
        video = jnp.asarray(video_io.to_model_range(frames_u8))[None]

        t0 = time.time()
        out = pipeline(
            prompt, video,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            noise_level=noise_level,
            negative_prompt=negative_prompt,
            key=jax.random.PRNGKey(seed),
        )
        out.block_until_ready()
        dt = time.time() - t0
        fps_out = frames_u8.shape[0] / dt

        entry = {"clip": name, "frames": int(frames_u8.shape[0]),
                 "sec": round(dt, 3), "fps": round(fps_out, 3)}

        if gt_dir is not None:
            gt_path = next(Path(gt_dir).glob(f"{name}.*"), None)
            if gt_path is not None:
                gt_u8, _, _ = video_io.read_video(str(gt_path))
                gt = jnp.asarray(video_io.to_model_range(gt_u8[: out.shape[1]]))
                pred = out[0][: gt.shape[0]]
                entry["psnr"] = float(jnp.mean(psnr(pred, gt)))
                entry["ssim"] = float(jnp.mean(ssim(pred, gt)))
                if lpips_fn is not None:
                    entry["lpips"] = float(jnp.mean(lpips_fn(pred, gt)))

        out_u8 = video_io.from_model_range(np.asarray(out[0]))
        video_io.write_video(os.path.join(output_dir, "video", f"{name}.mp4"),
                             out_u8, fps)
        with open(report_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        ledger.mark_done(name, sec=entry["sec"])
        results.append(entry)
    pool.shutdown(wait=False)

    # aggregate (including previously-completed entries in the report)
    all_entries = []
    if os.path.exists(report_path):
        with open(report_path) as f:
            all_entries = [json.loads(x) for x in f if x.strip()]
    agg = {"clips": len(all_entries)}
    for k in ("fps", "psnr", "ssim", "lpips"):
        vals = [e[k] for e in all_entries if k in e]
        if vals:
            agg[k] = round(float(np.mean(vals)), 4)
    return agg
