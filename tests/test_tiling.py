"""Tile plan vs a direct simulation of the reference paste-back loop
(inference_upscale_a_video.py:207-304): upscaling a tile by nearest ×4 and
pasting must exactly reconstruct the ×4-upscaled image for any geometry."""

import numpy as np
import pytest

from upscale_a_video_tpu.pipeline.tiling import needs_tiling, plan_tiles


def upscale4_nearest(img):
    return img.repeat(4, axis=0).repeat(4, axis=1)


@pytest.mark.parametrize(
    "h,w,tile", [(384, 384, 256), (400, 640, 256), (300, 520, 256),
                 (257, 257, 256), (512, 512, 256), (720, 1280, 320),
                 (320, 448, 256)]
)
def test_tiles_reconstruct_exactly(h, w, tile):
    rng = np.random.RandomState(0)
    img = rng.rand(h, w).astype(np.float32)
    want = upscale4_nearest(img)
    out = np.zeros((h * 4, w * 4), dtype=np.float32)
    covered = np.zeros((h * 4, w * 4), dtype=bool)

    for spec in plan_tiles(h, w, tile_size=tile, overlap=64):
        tile_in = img[spec.in_y0:spec.in_y1, spec.in_x0:spec.in_x1]
        tile_up = upscale4_nearest(tile_in)
        out[spec.out_y0:spec.out_y1, spec.out_x0:spec.out_x1] = \
            tile_up[spec.tile_y0:spec.tile_y1, spec.tile_x0:spec.tile_x1]
        covered[spec.out_y0:spec.out_y1, spec.out_x0:spec.out_x1] = True

    assert covered.all(), f"{(~covered).sum()} output pixels uncovered"
    np.testing.assert_array_equal(out, want)


def test_needs_tiling_threshold():
    assert needs_tiling(384, 384)
    assert needs_tiling(320, 520)  # 166k > 147k
    assert not needs_tiling(320, 320)


def test_shapes_mostly_uniform():
    # interior tiles share shapes → few jit recompilations
    specs = plan_tiles(720, 1280, 256, 64)
    shapes = {s.in_shape for s in specs}
    assert len(shapes) <= 6
