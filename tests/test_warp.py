"""grid_sample / flow_warp parity vs torch.nn.functional.grid_sample."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from upscale_a_video_tpu.ops.warp import flow_warp, grid_sample


def _torch_grid_sample(x_bhwc, grid, mode, align):
    t = torch.from_numpy(x_bhwc).permute(0, 3, 1, 2)
    g = torch.from_numpy(grid)
    out = F.grid_sample(t, g, mode=mode, padding_mode="zeros", align_corners=align)
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_random(mode, align):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 3).astype(np.float32)
    # grid partially out of range to exercise zero padding
    grid = rng.uniform(-1.3, 1.3, size=(2, 5, 7, 2)).astype(np.float32)
    want = _torch_grid_sample(x, grid, mode, align)
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid), mode, "zeros", align))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_identity_grid_bilinear():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    ys, xs = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8), indexing="ij")
    grid = np.stack([xs, ys], axis=-1)[None].astype(np.float32)
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid), align_corners=True))
    np.testing.assert_allclose(got, x, atol=1e-5)


def test_flow_warp_zero_flow_identity():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 7, 4).astype(np.float32)
    flow = np.zeros((1, 6, 7, 2), dtype=np.float32)
    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(got, x, atol=1e-5)


def test_flow_warp_integer_shift():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 6, 8, 1).astype(np.float32)
    # flow_x = +2: output(i, j) = x(i, j+2); rightmost 2 columns sample OOB → 0
    flow = np.zeros((1, 6, 8, 2), dtype=np.float32)
    flow[..., 0] = 2.0
    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(got[:, :, :-2], x[:, :, 2:], atol=1e-5)
    np.testing.assert_allclose(got[:, :, -2:], 0.0, atol=1e-6)


def test_flow_warp_matches_torch_reference():
    """Match the reference's flow_warp composition exactly
    (propagation_module.py:104-135)."""
    rng = np.random.RandomState(4)
    x = rng.randn(2, 10, 12, 4).astype(np.float32)
    flow = (rng.randn(2, 10, 12, 2) * 3).astype(np.float32)

    # torch reference: build grid + normalize + grid_sample(align_corners=True)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    f = torch.from_numpy(flow)
    h, w = 10, 12
    grid_y, grid_x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((grid_x, grid_y), 2).float()[None].expand(2, -1, -1, -1)
    vgrid = grid + f
    vgrid_x = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    vgrid_y = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    vgrid_scaled = torch.stack((vgrid_x, vgrid_y), dim=3)
    want = (
        F.grid_sample(t, vgrid_scaled, mode="bilinear", padding_mode="zeros", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_mode_for_latent_propagation():
    # The pipeline propagates latents with interpolation='nearest'
    # (pipeline_upscale_a_video.py:655)
    rng = np.random.RandomState(5)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    flow = (rng.randn(1, 8, 8, 2) * 2).astype(np.float32)
    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow), interpolation="nearest"))
    assert got.shape == x.shape
