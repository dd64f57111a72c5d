"""Color-correction parity vs a torch reimplementation of the reference
(color_correction.py — the script itself needs torchvision, so the two small
functions are reproduced inline from the published formulas)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from upscale_a_video_tpu.pipeline.color import adain_color_fix, wavelet_color_fix


def torch_calc_mean_std(feat, eps=1e-5):
    b, c = feat.shape[:2]
    var = feat.reshape(b, c, -1).var(dim=2) + eps
    std = var.sqrt().reshape(b, c, 1, 1)
    mean = feat.reshape(b, c, -1).mean(dim=2).reshape(b, c, 1, 1)
    return mean, std


def torch_adain(content, style):
    sm, ss = torch_calc_mean_std(style)
    cm, cs = torch_calc_mean_std(content)
    return ((content - cm) / cs) * ss + sm


def torch_wavelet_blur(image, radius):
    kernel = torch.tensor(
        [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]],
        dtype=image.dtype,
    )[None, None].repeat(3, 1, 1, 1)
    image = F.pad(image, (radius, radius, radius, radius), mode="replicate")
    return F.conv2d(image, kernel, groups=3, dilation=radius)


def torch_wavelet_fix(content, style, levels=5):
    def decomp(img):
        high = torch.zeros_like(img)
        for i in range(levels):
            r = 2**i
            low = torch_wavelet_blur(img, r)
            high += img - low
            img = low
        return high, low

    ch, _ = decomp(content)
    _, sl = decomp(style)
    return ch + sl


def _nchw(x_bhwc):
    return torch.from_numpy(x_bhwc).permute(0, 3, 1, 2)


def test_adain_matches_torch():
    rng = np.random.RandomState(0)
    content = rng.rand(2, 32, 32, 3).astype(np.float32)
    style = rng.rand(2, 32, 32, 3).astype(np.float32) * 0.5 + 0.2
    want = torch_adain(_nchw(content), _nchw(style)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(adain_color_fix(jnp.asarray(content), jnp.asarray(style)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_wavelet_matches_torch():
    rng = np.random.RandomState(1)
    content = rng.rand(1, 64, 64, 3).astype(np.float32)
    style = rng.rand(1, 64, 64, 3).astype(np.float32)
    want = torch_wavelet_fix(_nchw(content), _nchw(style)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(wavelet_color_fix(jnp.asarray(content), jnp.asarray(style)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_adain_transfers_stats():
    rng = np.random.RandomState(2)
    content = rng.rand(1, 16, 16, 3).astype(np.float32)
    style = (rng.rand(1, 16, 16, 3) * 0.3 + 0.5).astype(np.float32)
    out = np.asarray(adain_color_fix(jnp.asarray(content), jnp.asarray(style)))
    np.testing.assert_allclose(out.mean(axis=(1, 2)), style.mean(axis=(1, 2)), atol=1e-3)
    np.testing.assert_allclose(
        out.std(axis=(1, 2)), np.asarray(style).std(axis=(1, 2)), atol=1e-3
    )


def test_apply_color_fix_chunked_matches_single_call():
    """Frame-chunked apply_color_fix (CLI/serving path; bounds device
    transients at large output geometries) is exact vs the one-shot form —
    both fixes are per-frame, so chunk boundaries cannot change the math."""
    from upscale_a_video_tpu.ops.resize import resize_2d
    from upscale_a_video_tpu.pipeline.color import apply_color_fix

    rng = np.random.RandomState(3)
    t, h, w = 7, 12, 16  # 7 frames: chunk=4 exercises a ragged tail chunk
    lr = (rng.rand(t, h, w, 3).astype(np.float32) - 0.5) * 2
    out = (rng.rand(t, h * 4, w * 4, 3).astype(np.float32) - 0.5) * 2

    style = resize_2d(jnp.asarray(lr), (h * 4, w * 4), "bicubic")
    for mode, fix in (("AdaIn", adain_color_fix), ("Wavelet", wavelet_color_fix)):
        want = np.asarray(fix(jnp.asarray(out), style))
        got = apply_color_fix(mode, out, lr, chunk_frames=4)
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=mode)

    # unknown mode passes through unchanged
    np.testing.assert_array_equal(apply_color_fix("None", out, lr), out)
