"""Primitive-block parity vs torch: strided conv padding semantics, nearest
upsample, GroupNorm-over-video stats — the places where XLA/torch conventions
can silently diverge."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from upscale_a_video_tpu.nn.blocks import Downsample3D, InflatedConv, Upsample3D


def test_stride2_conv_matches_torch_padding1():
    """Downsample conv: torch Conv2d(k=3, s=2, p=1) vs our explicit pad."""
    rng = np.random.RandomState(0)
    for h, w in [(12, 12), (13, 15), (8, 10)]:
        x = rng.randn(1, 1, h, w, 4).astype(np.float32)  # (B,T,H,W,C)
        wgt = rng.randn(8, 4, 3, 3).astype(np.float32)   # torch OIHW
        bias = rng.randn(8).astype(np.float32)

        want = F.conv2d(torch.from_numpy(x[:, 0].transpose(0, 3, 1, 2)),
                        torch.from_numpy(wgt), torch.from_numpy(bias),
                        stride=2, padding=1)
        want = want.numpy().transpose(0, 2, 3, 1)

        model = Downsample3D(channels=8, use_conv=True, padding=1)
        params = {"params": {"conv": {"conv": {
            "kernel": jnp.asarray(wgt.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(bias)}}}}
        got = np.asarray(model.apply(params, jnp.asarray(x)))[:, 0]
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_stride2_conv_matches_torch_padding0_asym():
    """VAE encoder downsample: padding=0 → asymmetric (0,1,0,1) pad
    (resnet.py:188-192)."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 1, 16, 16, 4).astype(np.float32)
    wgt = rng.randn(8, 4, 3, 3).astype(np.float32)
    bias = rng.randn(8).astype(np.float32)

    t = torch.from_numpy(x[:, 0].transpose(0, 3, 1, 2))
    t = F.pad(t, (0, 1, 0, 1))
    want = F.conv2d(t, torch.from_numpy(wgt), torch.from_numpy(bias), stride=2)
    want = want.numpy().transpose(0, 2, 3, 1)

    model = Downsample3D(channels=8, use_conv=True, padding=0)
    params = {"params": {"conv": {"conv": {
        "kernel": jnp.asarray(wgt.transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(bias)}}}}
    got = np.asarray(model.apply(params, jnp.asarray(x)))[:, 0]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_nearest_upsample_matches_torch():
    rng = np.random.RandomState(2)
    for h, w, out in [(5, 7, None), (6, 6, None), (3, 3, (7, 5))]:
        x = rng.randn(1, 2, h, w, 3).astype(np.float32)
        t = torch.from_numpy(x.reshape(2, h, w, 3).transpose(0, 3, 1, 2))
        if out is None:
            want = F.interpolate(t, scale_factor=2, mode="nearest")
        else:
            want = F.interpolate(t, size=out, mode="nearest")
        want = want.numpy().transpose(0, 2, 3, 1)

        model = Upsample3D(channels=3, use_conv=False)
        got = np.asarray(model.apply({"params": {}}, jnp.asarray(x), out))
        np.testing.assert_allclose(got.reshape(want.shape), want, atol=1e-6)


def test_groupnorm_video_stats_match_torch():
    """GroupNorm on (B,C,T,H,W) must reduce over (C/g, T, H, W)."""
    rng = np.random.RandomState(3)
    x = rng.randn(2, 8, 3, 4, 5).astype(np.float32)  # torch NCTHW
    gn = torch.nn.GroupNorm(4, 8)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(rng.rand(8).astype(np.float32)))
        gn.bias.copy_(torch.from_numpy(rng.randn(8).astype(np.float32)))
    want = gn(torch.from_numpy(x)).detach().numpy()

    fx = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # B T H W C
    model = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(gn.weight.detach().numpy()),
                         "bias": jnp.asarray(gn.bias.detach().numpy())}}
    got = np.asarray(model.apply(params, fx)).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_inflated_conv_matches_torch_per_frame():
    rng = np.random.RandomState(4)
    x = rng.randn(1, 3, 6, 6, 4).astype(np.float32)
    wgt = rng.randn(5, 4, 3, 3).astype(np.float32)
    bias = rng.randn(5).astype(np.float32)

    frames = torch.from_numpy(x.reshape(3, 6, 6, 4).transpose(0, 3, 1, 2))
    want = F.conv2d(frames, torch.from_numpy(wgt), torch.from_numpy(bias),
                    padding=1).numpy().transpose(0, 2, 3, 1)

    model = InflatedConv(5, (3, 3))
    params = {"params": {"conv": {
        "kernel": jnp.asarray(wgt.transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(bias)}}}
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got.reshape(want.shape), want, atol=1e-4)
