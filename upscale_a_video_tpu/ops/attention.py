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
import numpy as np


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


def attention_packed_small(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Tiny-sequence attention (temporal T=8) packed for the MXU.

    The temporal attention runs S=8 attention over a huge batch
    (B' = batch·pixels, ref attention.py:626-733). As a batched matmul each
    (8, 64)·(64, 8) product uses 0.4% of a 128×128 MXU tile. Here P = 128//S
    batch elements are packed into one (P·S, D) tile, all-pairs scores are
    computed in a single full-width matmul, and a block-diagonal mask keeps
    only each element's own S×S attention — off-block probabilities are
    exactly 0, so the packed PV matmul is also exact. ~P× redundant FLOPs at
    ~P²× better MXU utilization.

    q/k/v: (B, H, S, D); bias broadcastable as (1, H, S, S) (per-head rel-pos,
    constant over the packed batch). All ops are plain XLA → differentiable.
    """
    b, h, s, d = q.shape
    out_dtype = q.dtype
    p = max(1, 128 // s)
    if p == 1:
        return attention_xla(q, k, v, scale, bias)
    b_pad = (b + p - 1) // p * p
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    # (B, H, S, D) → (H, B/P, P·S, D): heads become the slow axis so each
    # packed tile holds one head's bias
    def pack(x):
        x = x.transpose(1, 0, 2, 3).reshape(h, b_pad // p, p * s, d)
        return x

    qp, kp, vp = pack(q), pack(k), pack(v)
    scores = jnp.einsum("hgid,hgjd->hgij", qp, kp,
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale)

    blk = jnp.arange(p * s) // s
    allowed = blk[:, None] == blk[None, :]  # (P·S, P·S) block-diagonal
    if bias is not None:
        tiled = jnp.tile(bias.reshape(h, s, s).astype(jnp.float32), (1, p, p))
        scores = scores + tiled[:, None]
    neg = jnp.float32(-0.7 * np.finfo(np.float32).max)
    scores = jnp.where(allowed[None, None], scores, neg)
    scores = scores - jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("hgij,hgjd->hgid", probs, vp,
                     preferred_element_type=jnp.float32).astype(out_dtype)
    out = out.reshape(h, b_pad, s, d).transpose(1, 0, 2, 3)
    return out[:b]


def _packed_small_fits(q, k, bias) -> bool:
    if q.ndim != 4 or q.shape[-2] != k.shape[-2] or q.shape[-2] > 16:
        return False
    b, h, s, _ = q.shape
    if b * h < 1024:  # batch too small for packing to matter
        return False
    if bias is None:
        return True
    # per-head bias, constant over the packed batch axis
    return bias.shape == (1, h, s, s) or bias.shape == (h, s, s)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    bias: Optional[jax.Array] = None,
    subtract_max: bool = True,
    use_flash: Optional[bool] = None,
    use_packed: Optional[bool] = None,
) -> jax.Array:
    """Dispatching attention core. Shapes as :func:`attention_xla`."""
    if use_packed is None:
        use_packed = _on_tpu()
    if use_packed and _packed_small_fits(q, k, bias):
        return attention_packed_small(q, k, v, scale, bias)
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
