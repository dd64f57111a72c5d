"""Tiled runner: batched tile execution must reproduce per-tile execution and
cover the output exactly (fake pipeline = nearest x4 upscale)."""

import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.pipeline.tiled_run import run_tiled


class FakePipeline:
    """x4 nearest upscale, content-dependent so misplaced tiles are caught."""

    def __init__(self):
        self.calls = 0

    def __call__(self, prompts, tiles, flows_bi=None, **kw):
        self.calls += 1
        up = jnp.repeat(jnp.repeat(tiles, 4, axis=2), 4, axis=3)
        return up


def _video(h, w):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(1, 2, h, w, 3).astype(np.float32))


def test_matches_direct_upscale():
    v = _video(300, 520)
    fake = FakePipeline()
    out = run_tiled(fake, "p", v, tile_size=256, tile_batch=1)
    want = np.repeat(np.repeat(np.asarray(v), 4, axis=2), 4, axis=3)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_batched_tiles_same_result_fewer_calls():
    v = _video(512, 512)
    f1 = FakePipeline()
    out1 = run_tiled(f1, "p", v, tile_size=256, tile_batch=1)
    f4 = FakePipeline()
    out4 = run_tiled(f4, "p", v, tile_size=256, tile_batch=4)
    np.testing.assert_allclose(out1, out4, atol=1e-6)
    assert f4.calls < f1.calls


def test_flows_sliced_consistently():
    v = _video(300, 300)
    flows = (jnp.zeros((1, 1, 300, 300, 2)), jnp.zeros((1, 1, 300, 300, 2)))

    seen = []

    class P(FakePipeline):
        def __call__(self, prompts, tiles, flows_bi=None, **kw):
            assert flows_bi is not None
            assert flows_bi[0].shape[0] == tiles.shape[0]
            assert flows_bi[0].shape[2:4] == tiles.shape[2:4]
            seen.append(tiles.shape)
            return super().__call__(prompts, tiles, flows_bi, **kw)

    run_tiled(P(), "p", v, flows_bi=flows, tile_size=256, tile_batch=2)
    assert seen
