"""Resize op parity vs torch.nn.functional.interpolate (the reference's op)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from upscale_a_video_tpu.ops.resize import resize_2d


def _torch_resize(x_hwc: np.ndarray, out_hw, mode, align_corners=None):
    t = torch.from_numpy(x_hwc).permute(2, 0, 1)[None]  # 1 C H W
    kwargs = {}
    if mode in ("bilinear", "bicubic"):
        kwargs["align_corners"] = bool(align_corners)
    out = F.interpolate(t, size=out_hw, mode=mode, **kwargs)
    return out[0].permute(1, 2, 0).numpy()


CASES = [
    ((17, 23), (34, 46), "nearest", None),
    ((16, 16), (7, 5), "nearest", None),
    ((16, 16), (32, 32), "bilinear", False),
    ((15, 13), (40, 20), "bilinear", False),
    ((16, 16), (9, 33), "bilinear", True),
    ((16, 16), (64, 64), "bicubic", False),
    ((20, 11), (8, 29), "bicubic", False),
    ((13, 17), (52, 68), "bicubic", True),
    ((32, 32), (8, 8), "area", None),
    ((33, 17), (8, 8), "area", None),  # non-integer ratio
]


@pytest.mark.parametrize("in_hw,out_hw,mode,align", CASES)
def test_matches_torch(in_hw, out_hw, mode, align):
    rng = np.random.RandomState(0)
    x = rng.randn(*in_hw, 3).astype(np.float32)
    want = _torch_resize(x, out_hw, mode, align)
    got = np.asarray(resize_2d(jnp.asarray(x), out_hw, mode, bool(align)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_identity_noop():
    x = np.random.RandomState(1).randn(8, 8, 2).astype(np.float32)
    out = np.asarray(resize_2d(jnp.asarray(x), (8, 8), "bilinear"))
    np.testing.assert_array_equal(out, x)


def test_batched_video():
    x = np.random.RandomState(2).randn(2, 3, 8, 8, 3).astype(np.float32)
    out = resize_2d(jnp.asarray(x), (16, 16), "bilinear")
    assert out.shape == (2, 3, 16, 16, 3)
    # each frame independently matches
    want = _torch_resize(x[1, 2], (16, 16), "bilinear", False)
    np.testing.assert_allclose(np.asarray(out)[1, 2], want, atol=2e-5)
