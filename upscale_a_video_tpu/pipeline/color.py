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


def apply_color_fix(mode: str, output, lr, chunk_frames: int = 4):
    """Upsample the LR style reference and apply the selected fix,
    ``chunk_frames`` frames per device dispatch.

    Both fixes are per-frame (AdaIN stats reduce over H,W per frame; the
    wavelet blur is a per-frame depthwise conv — ref color_correction.py:
    44-119 is framewise too), so chunking is exact. The single-call form
    holds ~6 live copies of the full (T, 4H, 4W, 3) fp32 clip on top of the
    resident model params — at 27×1408×1920 that RESOURCE_EXHAUSTEDs a
    15.75 GB chip; chunked, the transient is bounded by ``chunk_frames``.

    output: (T, 4H, 4W, C) upscaled frames, model range (host or device).
    lr:     (T, H, W, C) low-res input frames, model range.
    Returns an np.ndarray of ``output``'s shape (fp32 on host).
    """
    import numpy as np

    from ..ops.resize import resize_2d

    if mode not in ("AdaIn", "Wavelet"):
        return np.asarray(output)
    fix = adain_color_fix if mode == "AdaIn" else wavelet_color_fix
    t = output.shape[0]
    oh, ow = output.shape[1], output.shape[2]

    @jax.jit
    def _fix_chunk(content, style_lr):
        return fix(content, resize_2d(style_lr, (oh, ow), "bicubic"))

    fixed = np.empty(output.shape, np.float32)
    for s0 in range(0, t, chunk_frames):
        sl = slice(s0, min(s0 + chunk_frames, t))
        fixed[sl] = np.asarray(
            _fix_chunk(jnp.asarray(output[sl]), jnp.asarray(lr[sl])))
    return fixed
