"""Modulated deformable conv vs a direct numpy implementation of the DCNv2
definition (torchvision layout), plus identity checks."""

import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.ops.deform_conv import deform_conv2d


def np_deform_conv(x, offset, weight, bias, stride, padding, dilation, mask):
    """x (B,H,W,C); offset (B,Ho,Wo,2GK) [Δy,Δx per tap]; weight (kh,kw,C,Cout)."""
    b, h, w, c = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    g = offset.shape[-1] // (2 * k)
    cg = c // g
    out = np.zeros((b, ho, wo, c_out))

    def sample(img, y, x_):
        hh, ww = img.shape[:2]
        if y < -1 or y > hh or x_ < -1 or x_ > ww:
            return np.zeros(img.shape[-1])
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        acc = np.zeros(img.shape[-1])
        for (yy, wy) in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
            for (xx, wx) in ((x0, 1 - (x_ - x0)), (x0 + 1, x_ - x0)):
                if 0 <= yy < hh and 0 <= xx < ww and wy * wx != 0:
                    acc += img[yy, xx] * wy * wx
        return acc

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for ki in range(kh):
                    for kj in range(kw):
                        kk = ki * kw + kj
                        for gi in range(g):
                            dy = offset[bi, oy, ox, 2 * (gi * k + kk)]
                            dx = offset[bi, oy, ox, 2 * (gi * k + kk) + 1]
                            y = oy * stride - padding + ki * dilation + dy
                            x_ = ox * stride - padding + kj * dilation + dx
                            s = sample(x[bi, :, :, gi * cg:(gi + 1) * cg], y, x_)
                            m = mask[bi, oy, ox, gi * k + kk]
                            out[bi, oy, ox] += (s * m) @ weight[ki, kj, gi * cg:(gi + 1) * cg]
    if bias is not None:
        out += bias
    return out


def test_zero_offset_equals_conv():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    wgt = rng.randn(3, 3, 4, 5).astype(np.float32)
    offset = np.zeros((1, 6, 6, 18), dtype=np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(wgt)))
    # plain 3x3 SAME conv
    import jax
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wgt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4)


def test_matches_numpy_reference():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 5, 5, 2).astype(np.float32)
    wgt = rng.randn(3, 3, 2, 3).astype(np.float32)
    bias = rng.randn(3).astype(np.float32)
    offset = (rng.randn(1, 5, 5, 18) * 0.7).astype(np.float32)
    mask = rng.rand(1, 5, 5, 9).astype(np.float32)

    want = np_deform_conv(x, offset, wgt, bias, 1, 1, 1, mask)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(wgt), jnp.asarray(bias), mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_deformable_groups():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    wgt = rng.randn(3, 3, 4, 2).astype(np.float32)
    offset = (rng.randn(1, 4, 4, 36) * 0.5).astype(np.float32)  # G=2
    mask = rng.rand(1, 4, 4, 18).astype(np.float32)
    want = np_deform_conv(x, offset, wgt, None, 1, 1, 1, mask)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(wgt), mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=1e-4)
