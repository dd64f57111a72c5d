"""Window plan equivalence vs a direct simulation of the reference's Python
loop (pipeline_upscale_a_video.py:601-635)."""

import numpy as np
import pytest

from upscale_a_video_tpu.pipeline.windows import (
    chunk_starts,
    window_blend_matrix,
    window_starts,
)


def reference_window_loop(preds_fn, num_frames, window=8, stride=6):
    """Simulate the torch loop: preds_fn(start, end) -> (end-start,) array."""
    out = [None] * num_frames
    for start_f in range(0, num_frames, stride):
        end_f = min(num_frames, start_f + window)
        if end_f - start_f < window:
            start_f = end_f - window
        pred = preds_fn(start_f, end_f)
        for k, idx in enumerate(range(start_f, end_f)):
            if out[idx] is None:
                out[idx] = pred[k]
            else:
                out[idx] = out[idx] * 0.5 + pred[k] * 0.5
    return np.asarray(out)


@pytest.mark.parametrize("T", [8, 9, 10, 12, 14, 16, 20, 25, 32, 50])
def test_blend_matrix_matches_reference_loop(T):
    rng = np.random.RandomState(T)
    # deterministic per-(start,end) prediction, as the UNet is
    window_cache = {}

    def preds_fn(s, e):
        if (s, e) not in window_cache:
            window_cache[(s, e)] = rng.randn(e - s)
        return window_cache[(s, e)]

    want = reference_window_loop(preds_fn, T)

    starts = window_starts(T)
    m = window_blend_matrix(T)
    preds = np.stack([preds_fn(s, s + 8) for s in starts])  # (n, 8)
    got = np.einsum("nkt,nk->t", m, preds)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_short_clip_single_window():
    assert window_starts(8) == (0,)
    assert window_starts(5) == (0,)
    m = window_blend_matrix(5)
    assert m.shape == (1, 5, 5)
    np.testing.assert_array_equal(m[0], np.eye(5))


def test_duplicate_last_window_case():
    # T=14: range gives starts 0, 6, 12→(right-aligned to 6) — duplicate window
    assert window_starts(14) == (0, 6, 6)


def test_chunk_starts():
    assert chunk_starts(7, 3) == ((0, 3), (3, 6), (6, 7))
    assert chunk_starts(3, 3) == ((0, 3),)
    assert chunk_starts(2, 3) == ((0, 2),)


class TestUniquePlan:
    def test_dedup_flagship_t32(self):
        from upscale_a_video_tpu.pipeline.windows import unique_window_plan

        ustarts, blend = unique_window_plan(32)
        assert ustarts == (0, 6, 12, 18, 24)
        assert blend.shape == (5, 8, 32)
        np.testing.assert_allclose(blend.sum(axis=(0, 1)), 1.0)

    def test_collapsed_weights_match_full_plan(self):
        """Scatter with collapsed weights == scatter with the full plan when
        duplicate windows carry identical predictions (they always do)."""
        from upscale_a_video_tpu.pipeline.windows import unique_window_plan

        for T in range(8, 51):
            starts = window_starts(T)
            full = window_blend_matrix(T)
            ustarts, blend = unique_window_plan(T)
            rng = np.random.RandomState(T)
            # per-START prediction (duplicates share it, as the UNet does)
            preds = {s: rng.randn(min(8, T), 3) for s in set(starts)}
            want = np.einsum("nkt,nkc->tc",
                             full, np.stack([preds[s] for s in starts]))
            got = np.einsum("nkt,nkc->tc",
                            blend, np.stack([preds[s] for s in ustarts]))
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"T={T}")

    def test_no_dup_geometries_unchanged(self):
        from upscale_a_video_tpu.pipeline.windows import unique_window_plan

        for T in (8, 10, 16, 96):
            ustarts, blend = unique_window_plan(T)
            assert ustarts == window_starts(T)
            np.testing.assert_array_equal(blend, window_blend_matrix(T))
