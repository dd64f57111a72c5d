"""Tiled pipeline execution shared by the CLI and the serving Predictor.

The reference runs one pipeline call per tile in a Python loop
(inference_upscale_a_video.py:230-304). TPU-first upgrade: tiles with the same
padded shape are **batched along the data axis** (`tile_batch` > 1) — one
jitted program upscales several tiles at once, converting the serial loop into
MXU batch parallelism. The paste-back arithmetic is plan_tiles' (exact
reference semantics).
"""

from __future__ import annotations

from collections import defaultdict
import numpy as np

from .tiling import plan_tiles


def run_tiled(
    pipeline,
    prompt: str,
    video,                      # (1, T, H, W, 3) jax array
    flows_bi=None,
    tile_size: int = 256,
    overlap: int = 64,
    tile_batch: int = 1,
    **call_kwargs,
) -> np.ndarray:
    """Returns (1, T, 4H, 4W, 3) numpy."""
    import jax.numpy as jnp

    b, t, h, w, _ = video.shape
    assert b == 1, "tiled runner operates on one clip"
    specs = plan_tiles(h, w, tile_size, overlap)
    output = np.zeros((1, t, h * 4, w * 4, 3), dtype=np.float32)

    groups = defaultdict(list)
    for spec in specs:
        groups[spec.in_shape].append(spec)

    for shape, group in groups.items():
        for i in range(0, len(group), max(tile_batch, 1)):
            batch_specs = group[i: i + max(tile_batch, 1)]
            tiles = jnp.concatenate(
                [video[:, :, s.in_y0:s.in_y1, s.in_x0:s.in_x1] for s in batch_specs],
                axis=0,
            )
            tile_flows = None
            if flows_bi is not None:
                tile_flows = tuple(
                    jnp.concatenate(
                        [f[:, :, s.in_y0:s.in_y1, s.in_x0:s.in_x1]
                         for s in batch_specs], axis=0)
                    for f in flows_bi
                )
            prompts = [prompt] * len(batch_specs)
            neg = call_kwargs.get("negative_prompt")
            if isinstance(neg, str):
                call_kwargs = dict(call_kwargs, negative_prompt=[neg] * len(batch_specs))
            out = np.asarray(pipeline(prompts, tiles, flows_bi=tile_flows,
                                      **call_kwargs))
            for j, s in enumerate(batch_specs):
                output[0, :, s.out_y0:s.out_y1, s.out_x0:s.out_x1] = \
                    out[j, :, s.tile_y0:s.tile_y1, s.tile_x0:s.tile_x1]
    return output
