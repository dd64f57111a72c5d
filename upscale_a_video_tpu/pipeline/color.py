"""Color correction post-processing (ref `/root/reference/models_video/color_correction.py`).

Transfers the color statistics of the bicubic-upsampled LR input ("style") to
the upscaled output ("content"), either by AdaIN per-channel moment matching
(:44-71) or by swapping low-frequency bands of a 5-level dilated-Gaussian
"wavelet" decomposition (:73-119).

Channels-last (..., H, W, C); applied per frame by the pipeline. Pure jnp —
the 3×3 dilated blur is a depthwise conv XLA fuses trivially.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _calc_mean_std(feat: jax.Array, eps: float = 1e-5):
    """Per-channel spatial mean/std; feat (B, H, W, C) → (B, 1, 1, C).

    Uses the unbiased variance to match torch ``Tensor.var`` (ref :54).
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    mean = flat.mean(axis=1)
    n = h * w
    var = flat.var(axis=1) * (n / max(n - 1, 1))  # unbiased
    std = jnp.sqrt(var + eps)
    return mean[:, None, None, :], std[:, None, None, :]


def adain_color_fix(content: jax.Array, style: jax.Array) -> jax.Array:
    """AdaIN moment transfer (ref :59-71). content/style: (B, H, W, C)."""
    style_mean, style_std = _calc_mean_std(style)
    content_mean, content_std = _calc_mean_std(content)
    normalized = (content - content_mean) / content_std
    return normalized * style_std + style_mean


def _wavelet_blur(image: jax.Array, radius: int) -> jax.Array:
    """3×3 dilated Gaussian blur, replicate padding, depthwise (ref :73-92).

    image: (B, H, W, C).
    """
    c = image.shape[-1]
    kernel = jnp.asarray(
        [[0.0625, 0.125, 0.0625],
         [0.125, 0.25, 0.125],
         [0.0625, 0.125, 0.0625]],
        dtype=image.dtype,
    )
    # depthwise kernel (kh, kw, in_per_group=1, C)
    dw = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    padded = jnp.pad(
        image, ((0, 0), (radius, radius), (radius, radius), (0, 0)), mode="edge"
    )
    return jax.lax.conv_general_dilated(
        padded,
        dw,
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def wavelet_decomposition(image: jax.Array, levels: int = 5):
    """(high_freq, low_freq) bands (ref :94-106)."""
    high_freq = jnp.zeros_like(image)
    low_freq = image
    for i in range(levels):
        radius = 2**i
        blurred = _wavelet_blur(image, radius)
        high_freq = high_freq + (image - blurred)
        image = blurred
        low_freq = blurred
    return high_freq, low_freq


def wavelet_color_fix(content: jax.Array, style: jax.Array) -> jax.Array:
    """content high-freq + style low-freq (ref :108-119)."""
    content_high, _ = wavelet_decomposition(content)
    _, style_low = wavelet_decomposition(style)
    return content_high + style_low
