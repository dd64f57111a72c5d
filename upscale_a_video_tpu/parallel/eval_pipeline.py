"""Multi-chip drop-in pipeline: the single-chip VideoUpscalePipeline call
contract backed by the window-sharded denoise + chunk-sharded decode.

``evaluate_directory`` (pipeline/eval.py) and the CLI take any pipeline
callable; this adapter lets the YouHQ40-style batch eval run one clip as ONE
sharded program over a mesh (VERDICT round-1 item 4: ~32-frame clips cannot
use the temporal-chunk mesh — the window-item axis shards any T on any device
count). Text encoding, LR noising, latent init and RNG handling reuse the
single-chip pipeline verbatim so seeds produce identical streams; equivalence
vs. the single-chip pipeline is tested on an 8-device CPU mesh
(tests/test_eval_pipeline_sharded.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..pipeline.pipeline import PipelineModules, VideoUpscalePipeline
from .decode import build_sharded_decode
from .window_parallel import build_window_sharded_denoise


class ShardedVideoUpscalePipeline(VideoUpscalePipeline):
    """VideoUpscalePipeline whose denoise scan shards the sliding-window
    work items over ``mesh[axis]`` and whose chunked VAE decode round-robins
    the 3-frame chunks over the same mesh."""

    def __init__(
        self,
        modules: PipelineModules,
        mesh: Mesh,
        axis: str = "win",
        dtype=jnp.bfloat16,
        decode_dtype=jnp.float32,
        unet_window: int = 8,
        unet_stride: int = 6,
        decode_chunk: int = 3,
        pab=None,
    ):
        super().__init__(
            modules, dtype=dtype, decode_dtype=decode_dtype,
            unet_window=unet_window, unet_stride=unet_stride,
            decode_chunk=decode_chunk, pab=pab,
        )
        self.mesh = mesh
        self.axis = axis

    def _build_denoise(self, shape, num_inference_steps, do_cfg,
                       guidance_scale, prop_mask, has_flows):
        b, t, h, w = shape
        prop_steps = tuple(i for i, p in enumerate(prop_mask) if p)
        fn = build_window_sharded_denoise(
            self.m.unet, self.m.scheduler, self.mesh,
            num_inference_steps, guidance_scale if do_cfg else 0.0,
            num_frames=t, batch=b, axis=self.axis,
            window=self.unet_window, stride=self.unet_stride,
            compute_dtype=self.dtype,
            propagation_steps=prop_steps if has_flows else (),
            # multi-chip PAB: each chip carries only its items' caches
            # (window_parallel.py; sharded-PAB == single-chip-PAB)
            pab=self.pab,
        )
        if has_flows:
            return fn

        def without_flows(params, latents, image_noised, prompt_embeds,
                          denoise_level, flows_f, flows_b):
            return fn(params, latents, image_noised, prompt_embeds,
                      denoise_level)

        return without_flows

    def decode_latents(self, latents, image_dec, w_lr: float = 1.0,
                       progress_cb=None):
        t = latents.shape[1]
        key = (t, float(w_lr))
        if key not in self._decode_cache:
            self._decode_cache[key] = build_sharded_decode(
                self.m.vae, self.mesh, num_frames=t, chunk=self.decode_chunk,
                axis=self.axis, decode_dtype=self.decode_dtype, w_lr=w_lr)
        vae_params = self._stage_params(self.m.vae_params)
        out = self._decode_cache[key](vae_params, latents, image_dec)
        if progress_cb is not None:
            progress_cb("decode", 1, 1)  # one sharded dispatch decodes all
        return out

    def compute_flows(self, runner, frames):
        """Data-parallel bidirectional flow over this pipeline's mesh
        (parallel/flow.py): drop-in for the serial
        ``models.raft.compute_bidirectional_flows`` in eval/CLI drivers."""
        if not hasattr(self, "_flow_fn") or self._flow_runner is not runner:
            from .flow import build_sharded_flows

            self._flow_fn = build_sharded_flows(runner, self.mesh, self.axis)
            self._flow_runner = runner
        return self._flow_fn(frames)
