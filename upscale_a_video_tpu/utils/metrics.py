"""Video quality metrics (PSNR / SSIM) for the eval gate.

The reference computes no metrics in-repo (SURVEY §5.5); the paper reports
PSNR/SSIM/LPIPS on YouHQ40. PSNR and SSIM are implemented here in pure jnp
(jit-able, batched over frames). LPIPS requires pretrained AlexNet/VGG
features; ``lpips()`` accepts any feature-extractor callable so a converted
backbone can plug in.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def psnr(a: jax.Array, b: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Per-frame PSNR in dB. a/b: (..., H, W, C) in [-1, 1] by default."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=(-3, -2, -1))
    mse = jnp.maximum(mse, 1e-12)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(a: jax.Array, b: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Per-frame SSIM (standard 11×11 Gaussian window, k1=0.01, k2=0.03).

    a/b: (..., H, W, C). Returns (...,) mean SSIM over pixels and channels.
    """
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kern = _gaussian_kernel()
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lead = a.shape[:-3]
    h, w, c = a.shape[-3:]
    af = a.reshape(-1, h, w, c)
    bf = b.reshape(-1, h, w, c)

    dw = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))

    def blur(x):
        return jax.lax.conv_general_dilated(
            x, dw, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    mu_a = blur(af)
    mu_b = blur(bf)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sig_a = blur(af * af) - mu_aa
    sig_b = blur(bf * bf) - mu_bb
    sig_ab = blur(af * bf) - mu_ab

    s = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sig_a + sig_b + c2)
    )
    return s.mean(axis=(1, 2, 3)).reshape(lead)


def lpips(
    a: jax.Array,
    b: jax.Array,
    feature_fn: Optional[Callable[[jax.Array], list]] = None,
) -> jax.Array:
    """LPIPS-style perceptual distance given a feature extractor returning a
    list of (B, H, W, C) feature maps. Without one, raises — pretrained
    backbone weights are an external asset."""
    if feature_fn is None:
        raise ValueError(
            "lpips requires a pretrained feature extractor (e.g. converted "
            "AlexNet); pass feature_fn"
        )
    fa = feature_fn(a)
    fb = feature_fn(b)
    total = 0.0
    for xa, xb in zip(fa, fb):
        na = xa / jnp.sqrt(jnp.sum(xa**2, axis=-1, keepdims=True) + 1e-10)
        nb = xb / jnp.sqrt(jnp.sum(xb**2, axis=-1, keepdims=True) + 1e-10)
        total = total + jnp.mean(jnp.square(na - nb), axis=(1, 2, 3))
    return total
