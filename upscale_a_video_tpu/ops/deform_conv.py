"""Modulated deformable convolution (DCNv2) — component N4 of SURVEY §2.11.

Replaces ``torchvision.ops.deform_conv2d`` used by the learnable propagator
(propagation_module.py:370) and the WarpModule (temporal_module.py:616).

Formulation: for each kernel tap k at dilated offset p_k, sample the input
bilinearly at ``p + p_k + Δp_k(p)``, scale by the modulation mask m_k(p), and
contract with the weight slice — a static loop of K gather-samples feeding one
einsum per tap; XLA fuses the taps, and the contraction runs on the MXU.

Layout (channels-last):
    x:      (B, H, W, C_in)
    offset: (B, H_out, W_out, 2·G·K)   torchvision channel order —
            [2·(g·K+k)] = Δy, [2·(g·K+k)+1] = Δx
    mask:   (B, H_out, W_out, G·K)
    weight: (kh, kw, C_in // groups, C_out)
Zero padding at borders (out-of-range samples contribute 0), stride/dilation
supported; matches torchvision semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_sample_abs(x: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample x (B,H,W,C) at absolute fractional coords ys/xs (B,Ho,Wo).
    Out-of-range → 0 (torchvision deform_conv semantics)."""
    b, h, w, c = x.shape

    def gather(iy, ix):
        valid = (iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        flat = x.reshape(b, h * w, c)
        idx = (iyc * w + ixc).astype(jnp.int32).reshape(b, -1, 1)
        out = jnp.take_along_axis(flat, idx, axis=1).reshape(b, *iy.shape[1:], c)
        return out * valid[..., None].astype(out.dtype)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    return (
        gather(y0i, x0i) * ((1 - wy1) * (1 - wx1))[..., None]
        + gather(y0i, x0i + 1) * ((1 - wy1) * wx1)[..., None]
        + gather(y0i + 1, x0i) * (wy1 * (1 - wx1))[..., None]
        + gather(y0i + 1, x0i + 1) * (wy1 * wx1)[..., None]
    )


def deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Channels-last modulated deformable conv. Returns (B, Ho, Wo, C_out)."""
    b, h, w, c_in = x.shape
    kh, kw, c_in_g, c_out = weight.shape
    k = kh * kw
    groups = c_in // c_in_g
    assert groups == 1, "channel groups != 1 not needed by the reference models"
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    g = offset.shape[-1] // (2 * k)  # deformable groups
    assert offset.shape == (b, ho, wo, 2 * g * k), offset.shape
    if mask is None:
        mask = jnp.ones((b, ho, wo, g * k), x.dtype)

    base_y = jnp.arange(ho, dtype=jnp.float32)[:, None] * stride - padding
    base_x = jnp.arange(wo, dtype=jnp.float32)[None, :] * stride - padding

    cg = c_in // g  # input channels per deformable group
    out = jnp.zeros((b, ho, wo, c_out), jnp.float32)
    for ki in range(kh):
        for kj in range(kw):
            kk = ki * kw + kj
            w_slice = weight[ki, kj]  # (C_in, C_out)
            for gi in range(g):
                dy = offset[..., 2 * (gi * k + kk)]
                dx = offset[..., 2 * (gi * k + kk) + 1]
                ys = base_y[None] + ki * dilation + dy.astype(jnp.float32)
                xs = base_x[None] + kj * dilation + dx.astype(jnp.float32)
                xg = x[..., gi * cg:(gi + 1) * cg]
                sampled = _bilinear_sample_abs(xg, ys, xs)
                sampled = sampled * mask[..., gi * k + kk][..., None]
                out = out + jnp.einsum(
                    "bhwc,cd->bhwd", sampled.astype(jnp.float32),
                    w_slice[gi * cg:(gi + 1) * cg].astype(jnp.float32),
                )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
