"""RAFT components: correlation pyramid + lookup and convex upsampling vs
torch reimplementations of the published formulas (RAFT/corr.py, raft.py:73-84);
shape/finiteness for the full model."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from upscale_a_video_tpu.models.raft import (
    RAFT,
    build_corr_pyramid,
    load_raft,
    lookup_corr,
    compute_flow_pair,
)


def torch_corr_pyramid(fmap1, fmap2, num_levels=4):
    b, d, h, w = fmap1.shape
    f1 = fmap1.view(b, d, h * w)
    f2 = fmap2.view(b, d, h * w)
    corr = torch.matmul(f1.transpose(1, 2), f2).view(b * h * w, 1, h, w)
    corr = corr / torch.sqrt(torch.tensor(d).float())
    pyr = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyr.append(corr)
    return pyr


def torch_bilinear_sampler(img, coords):
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


def torch_lookup(pyr, coords, radius=4):
    r = radius
    coords = coords.permute(0, 2, 3, 1)
    batch, h1, w1, _ = coords.shape
    out = []
    for i, corr in enumerate(pyr):
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(batch * h1 * w1, 1, 1, 2) / 2**i
        # the reference adds delta (dy,dx-stacked) to (x,y) coords unflipped
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        sampled = torch_bilinear_sampler(corr, coords_lvl)
        out.append(sampled.view(batch, h1, w1, -1))
    return torch.cat(out, dim=-1).permute(0, 3, 1, 2)


class TestCorr:
    def test_pyramid_matches_torch(self):
        rng = np.random.RandomState(0)
        f1 = rng.randn(1, 32, 8, 8).astype(np.float32)  # torch NCHW
        f2 = rng.randn(1, 32, 8, 8).astype(np.float32)
        want = torch_corr_pyramid(torch.from_numpy(f1), torch.from_numpy(f2))
        got = build_corr_pyramid(
            jnp.asarray(f1.transpose(0, 2, 3, 1)), jnp.asarray(f2.transpose(0, 2, 3, 1))
        )
        assert len(got) == len(want)
        for g, t in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g)[..., 0], t.numpy()[:, 0], atol=1e-4
            )

    def test_lookup_matches_torch(self):
        rng = np.random.RandomState(1)
        # 16x16 keeps the deepest pyramid level >= 2x2: torch's sampler
        # divides by (W-1) and NaNs at 1x1 levels; ours guards. Real /8
        # feature maps are always >= 8x8.
        f1 = rng.randn(1, 16, 16, 16).astype(np.float32)
        f2 = rng.randn(1, 16, 16, 16).astype(np.float32)
        coords = (rng.rand(1, 2, 16, 16) * 15).astype(np.float32)  # torch (B,2,H,W)

        want = torch_lookup(
            torch_corr_pyramid(torch.from_numpy(f1), torch.from_numpy(f2)),
            torch.from_numpy(coords),
        ).numpy()

        pyr = build_corr_pyramid(
            jnp.asarray(f1.transpose(0, 2, 3, 1)), jnp.asarray(f2.transpose(0, 2, 3, 1))
        )
        got = lookup_corr(pyr, jnp.asarray(coords.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
        )


def torch_upsample_flow(flow, mask):
    N, _, H, W = flow.shape
    mask = mask.view(N, 1, 9, 8, 8, H, W)
    mask = torch.softmax(mask, dim=2)
    up_flow = F.unfold(8 * flow, [3, 3], padding=1)
    up_flow = up_flow.view(N, 2, 9, 1, 1, H, W)
    up_flow = torch.sum(mask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    return up_flow.reshape(N, 2, 8 * H, 8 * W)


class TestUpsampleFlow:
    def test_matches_torch(self):
        rng = np.random.RandomState(2)
        flow = rng.randn(1, 2, 4, 5).astype(np.float32)
        mask = rng.randn(1, 576, 4, 5).astype(np.float32)
        want = torch_upsample_flow(torch.from_numpy(flow), torch.from_numpy(mask)).numpy()

        model = RAFT()
        got = model.upsample_flow(
            jnp.asarray(flow.transpose(0, 2, 3, 1)),
            jnp.asarray(mask.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
        )


class TestFullModel:
    @pytest.mark.slow
    def test_shapes_and_finite(self):
        runner = load_raft(None, iters=2)
        frames = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32, 3),
                                    minval=-1, maxval=1)
        fwd, bwd = compute_flow_pair(runner, frames)
        assert fwd.shape == (1, 2, 32, 32, 2)
        assert bwd.shape == (1, 2, 32, 32, 2)
        assert np.isfinite(np.asarray(fwd)).all()

    def test_non_divisible_input(self):
        runner = load_raft(None, iters=1)
        frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 30, 36, 3),
                                    minval=-1, maxval=1)
        fwd, bwd = compute_flow_pair(runner, frames)
        assert fwd.shape == (1, 1, 30, 36, 2)
