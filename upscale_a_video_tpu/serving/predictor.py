"""Serving Predictor — the Cog/Replicate deployment surface
(ref `/root/reference/web-demos/replicate/predict.py:59-421`).

Mirrors the reference Predictor's API deltas vs the CLI (predict.py:108-184):
- ``caption``: user-suppliable caption overrides the auto-captioner (:182-184)
- ``seed``: optional; random when unset (:157-159)
- guidance as float; default noise_level 150
Setup loads the models once; predict() runs the same tile/propagation path as
the CLI driver.
"""

from __future__ import annotations

import os
import secrets
import time
from typing import Optional, Sequence

import numpy as np


class Predictor:
    def __init__(self):
        self.pipeline = None
        self.raft = None
        self.captioner = None

    def setup(
        self,
        model_dir: str = "./pretrained_models/upscale_a_video",
        use_video_vae: bool = False,
        random_weights: bool = False,
        with_captioner: bool = True,
    ) -> None:
        import jax.numpy as jnp

        from ..pipeline.loader import load_pipeline

        self.model_dir = model_dir
        self.pipeline = load_pipeline(
            None if random_weights else model_dir,
            use_video_vae=use_video_vae,
            decode_dtype=jnp.bfloat16,
            random_init=random_weights,
        )
        if with_captioner:
            from ..captioner import build_captioner

            self.captioner = build_captioner()

    def predict(
        self,
        video_path: str,
        output_path: str = "./results",
        noise_level: int = 150,
        guidance_scale: float = 6.0,
        inference_steps: int = 30,
        propagation_steps: Sequence[int] = (),
        caption: Optional[str] = None,
        a_prompt: str = "best quality, extremely detailed",
        n_prompt: str = "blur, worst quality",
        color_fix: str = "None",
        tile_size: int = 256,
        seed: Optional[int] = None,
    ) -> str:
        """Upscale one video; returns the output mp4 path."""
        assert self.pipeline is not None, "call setup() first"
        import jax
        import jax.numpy as jnp

        from ..ops.resize import resize_2d
        from ..pipeline.color import adain_color_fix, wavelet_color_fix
        from ..pipeline.tiling import needs_tiling, plan_tiles
        from ..utils import video_io

        if seed is None:
            seed = secrets.randbelow(2**31)  # random default (ref :157-159)

        frames_u8, fps, name = video_io.read_video(video_path)
        if caption is None and self.captioner is not None:
            caption = self.captioner(frames_u8[0])
        prompt = (caption or "") + a_prompt

        frames = video_io.to_model_range(frames_u8)
        h, w = frames.shape[1:3]
        if h >= 1280 and w >= 1280:
            frames = np.asarray(resize_2d(jnp.asarray(frames), (h // 4, w // 4), "area"))
            h, w = frames.shape[1:3]
        video = jnp.asarray(frames)[None]
        t = video.shape[1]

        flows_bi = None
        if propagation_steps:
            from ..models.raft import compute_bidirectional_flows, load_raft

            raft_path = os.path.join(self.model_dir, "propagator/raft-things.pth")
            if self.raft is None:
                self.raft = load_raft(raft_path if os.path.exists(raft_path) else None)
            flows_bi = compute_bidirectional_flows(self.raft, video)

        common = dict(
            num_inference_steps=inference_steps,
            guidance_scale=guidance_scale,
            noise_level=noise_level,
            negative_prompt=n_prompt,
            propagation_steps=list(propagation_steps),
            key=jax.random.PRNGKey(seed),
        )

        t0 = time.time()
        if needs_tiling(h, w):
            specs = plan_tiles(h, w, tile_size, 64)
            output = np.zeros((1, t, h * 4, w * 4, 3), dtype=np.float32)
            for spec in specs:
                tile = video[:, :, spec.in_y0:spec.in_y1, spec.in_x0:spec.in_x1]
                tile_flows = None
                if flows_bi is not None:
                    tile_flows = tuple(
                        f[:, :, spec.in_y0:spec.in_y1, spec.in_x0:spec.in_x1]
                        for f in flows_bi
                    )
                out_tile = np.asarray(
                    self.pipeline(prompt, tile, flows_bi=tile_flows, **common))
                output[:, :, spec.out_y0:spec.out_y1, spec.out_x0:spec.out_x1] = \
                    out_tile[:, :, spec.tile_y0:spec.tile_y1, spec.tile_x0:spec.tile_x1]
        else:
            output = np.asarray(self.pipeline(prompt, video, flows_bi=flows_bi, **common))

        if color_fix in ("AdaIn", "Wavelet"):
            style = resize_2d(video[0], (h * 4, w * 4), "bicubic")
            fix = adain_color_fix if color_fix == "AdaIn" else wavelet_color_fix
            output = np.asarray(fix(jnp.asarray(output[0]), style))[None]

        out_u8 = video_io.from_model_range(output[0])
        out_file = os.path.join(output_path, f"{name}_upscaled.mp4")
        video_io.write_video(out_file, out_u8, fps)
        print(f"predict: {time.time() - t0:.1f}s → {out_file}")
        return out_file
