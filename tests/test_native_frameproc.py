"""Native frame-processing kernels vs numpy reference formulas."""

import numpy as np
import pytest

from upscale_a_video_tpu.utils import native_frameproc as nf


@pytest.fixture(scope="module", autouse=True)
def ensure_native():
    lib = nf._load()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")


def test_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(3, 17, 13, 3), dtype=np.uint8)
    got = nf.normalize_u8(frames)
    want = (frames.astype(np.float32) / 255.0 - 0.5) * 2.0
    np.testing.assert_allclose(got, want, atol=1e-7)
    assert got.dtype == np.float32


def test_denormalize_matches_numpy():
    rng = np.random.RandomState(1)
    frames = rng.uniform(-1.3, 1.3, size=(2, 9, 11, 3)).astype(np.float32)
    got = nf.denormalize_f32(frames)
    want = (np.clip(frames / 2 + 0.5, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_roundtrip():
    # fp32 rounding + trunc-to-uint8 (the reference's own convention) can be
    # off by one level on the roundtrip
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    back = nf.denormalize_f32(nf.normalize_u8(frames))
    assert np.abs(back.astype(np.int16) - frames.astype(np.int16)).max() <= 1


def test_area_downsample4():
    rng = np.random.RandomState(3)
    frames = rng.rand(2, 16, 24, 3).astype(np.float32)
    got = nf.area_downsample4(frames)
    want = frames.reshape(2, 4, 4, 6, 4, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (2, 4, 6, 3)
