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


def test_subpix_upconv_matches_torch_upsample_conv():
    """The folded ×2-subpixel conv (Upsample3D exact-×2 path) ≡ torch
    nearest-×2 upsample followed by Conv2d(k=3, p=1) — the tap-aliasing
    fold must be exact weight algebra, not an approximation."""
    rng = np.random.RandomState(5)
    for h, w in [(5, 7), (8, 8), (3, 4)]:
        x = rng.randn(1, 2, h, w, 4).astype(np.float32)
        wgt = rng.randn(6, 4, 3, 3).astype(np.float32)  # torch OIHW
        bias = rng.randn(6).astype(np.float32)

        frames = torch.from_numpy(
            x.reshape(2, h, w, 4).transpose(0, 3, 1, 2))
        up = F.interpolate(frames, scale_factor=2, mode="nearest")
        want = F.conv2d(up, torch.from_numpy(wgt), torch.from_numpy(bias),
                        padding=1).numpy().transpose(0, 2, 3, 1)

        model = Upsample3D(channels=6, use_conv=True)
        params = {"params": {"conv": {"conv": {
            "kernel": jnp.asarray(wgt.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(bias)}}}}
        got = np.asarray(model.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got.reshape(want.shape), want, atol=2e-4)


def test_subpix_upconv_fused_matches_naive_and_kill_switch(monkeypatch):
    """Fused subpixel path ≡ the naive upsample-then-conv route under the
    same params, and UAV_NO_SUBPIX_UP forces the naive route."""
    from upscale_a_video_tpu.nn.blocks import _SubpixUpConv

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 2, 6, 5, 4).astype(np.float32))
    model = _SubpixUpConv(features=7)
    params = model.init(jax.random.PRNGKey(0), x)
    fused = np.asarray(model.apply(params, x))
    naive = np.asarray(model.apply(params, x, naive=True))
    assert fused.shape == (1, 2, 12, 10, 7)
    np.testing.assert_allclose(fused, naive, atol=2e-5, rtol=1e-5)

    monkeypatch.setenv("UAV_NO_SUBPIX_UP", "1")
    gated = np.asarray(model.apply(params, x))
    np.testing.assert_array_equal(gated, naive)


def test_lean_groupnorm_matches_flax_groupnorm():
    """LeanGroupNorm ≡ nn.GroupNorm: identical param tree ("scale"/"bias"),
    identical f32-stat math, on both f32 and bf16 activations."""
    from upscale_a_video_tpu.nn.blocks import LeanGroupNorm

    rng = np.random.RandomState(7)
    scale = jnp.asarray(rng.rand(16).astype(np.float32))
    bias = jnp.asarray(rng.randn(16).astype(np.float32))
    params = {"params": {"scale": scale, "bias": bias}}
    x32 = jnp.asarray(rng.randn(3, 5, 4, 16).astype(np.float32) * 3 + 1)

    for dt, atol in [(jnp.float32, 1e-5), (jnp.bfloat16, 1e-2)]:
        x = x32.astype(dt)
        want = nn.GroupNorm(num_groups=4, epsilon=1e-6, dtype=dt).apply(
            params, x)
        got = LeanGroupNorm(num_groups=4, epsilon=1e-6, dtype=dt).apply(
            params, x)
        assert got.dtype == want.dtype == dt
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32), atol=atol)
