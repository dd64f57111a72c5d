"""Scaled-dot-product attention core.

Single entry point used by every attention module (spatial self, text cross,
temporal, VAE mid-block). Replaces the reference's three CUDA paths —
baddbmm+softmax (attention.py:209-238), xformers memory-efficient attention
(attention.py:283-289), and the temporal einsum core (attention.py:699-733) —
with one function that dispatches to:

- a Pallas TPU flash-attention kernel (``upscale_a_video_tpu.ops.flash_attention``)
  when running on TPU and the geometry fits, or
- a fused XLA einsum-softmax path otherwise (CPU tests, tiny shapes).

Softmax is computed in fp32 regardless of the IO dtype (bf16 in production).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    bias: Optional[jax.Array] = None,
    subtract_max: bool = True,
) -> jax.Array:
    """Reference XLA attention.

    q: (..., Sq, D), k/v: (..., Sk, D), bias broadcastable to (..., Sq, Sk).
    Returns (..., Sq, D) in q.dtype.
    """
    out_dtype = q.dtype
    scores = jnp.einsum("...id,...jd->...ij", q, k, preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if subtract_max:
        scores = scores - jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("...ij,...jd->...id", probs, v, preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    bias: Optional[jax.Array] = None,
    subtract_max: bool = True,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Dispatching attention core. Shapes as :func:`attention_xla`."""
    if use_flash is None:
        use_flash = _on_tpu()
    if use_flash:
        try:
            from .flash_attention import flash_attention_fits, flash_attention

            if flash_attention_fits(q, k, v, bias):
                return flash_attention(q, k, v, scale, bias)
        except ImportError:  # pragma: no cover
            pass
    return attention_xla(q, k, v, scale, bias, subtract_max)
