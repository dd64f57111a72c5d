"""Fused LN → short-KV cross-attention → out-proj Pallas kernel.

The UNet's text cross-attentions (attn1 at the 3 only_cross levels + attn2
everywhere, ref attention.py:437-476) attend a huge query set (batch·frames·
pixels tokens) to only 77 text keys. XLA materializes the fp32 score tensor
plus LayerNorm / head-split / merge intermediates — several HBM passes over
the token activations for ~0.3 TFLOP of useful work.

Key algebraic move: with so few keys, the q-projection and the keys collapse
into one per-batch matrix, and the values and output projection collapse into
another —

    scores_h = (LN(x)·Wq_h)·K_hᵀ = LN(x)·M_h,   M_h = Wq_h·K_hᵀ   (C, Skv)
    delta    = Σ_h softmax(scores_h)·V_h·Wo_h = P·Vo,  Vo = blockdiag(V_h)·Wo

M (B, C, H·Skv) and Vo (B, H·Skv, C) are precomputed in XLA per clip (tiny:
the text context is step- and frame-invariant). The kernel then reads an
(r, C) tile of the *pre-norm* hidden states ONCE, applies LayerNorm, does TWO
dense (r,C)@(C,H·Skv) GEMMs with a per-head segmented softmax between them,
and writes the (r, C) attention delta (the residual add stays in XLA where it
fuses into the next op). The per-frame context repeat
(nn/attention.py Transformer3DModel) disappears into the block index_map.

Differentiable via custom VJP (recompute backward through the XLA reference).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SKV_PAD = 128
NEG = -0.7 * float(np.finfo(np.float32).max)
_VMEM_LIMIT = 100 * 1024 * 1024


def _kernel(x_ref, lns_ref, lnb_ref, m_ref, vo_ref, pb_ref, bo_ref, o_ref,
            *, heads: int, eps: float, add_residual: bool):
    x = x_ref[0].astype(jnp.float32)                       # (r, C)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
    hn = (x - mu) * jax.lax.rsqrt(var + eps)
    hn = hn * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    hn = hn.astype(o_ref.dtype)

    s = jax.lax.dot(hn, m_ref[0], preferred_element_type=jnp.float32)
    s = s + pb_ref[0].astype(jnp.float32)                  # (r, H·SKV_PAD)

    # per-head segmented softmax on static 128-lane slices
    segs = []
    for h in range(heads):
        sh = s[:, h * SKV_PAD:(h + 1) * SKV_PAD]
        m = jnp.max(sh, axis=1, keepdims=True)
        p = jnp.exp(sh - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        segs.append(p / l)
    probs = jnp.concatenate(segs, axis=1).astype(o_ref.dtype)

    delta = jax.lax.dot(probs, vo_ref[0], preferred_element_type=jnp.float32)
    delta = delta + bo_ref[0].astype(jnp.float32)
    if add_residual:
        delta = delta + x  # x already in VMEM: kills the standalone XLA add
    o_ref[0] = delta.astype(o_ref.dtype)


def _reference(x, ln_scale, ln_bias, m, vo, pad_bias, bo,
               t_repeat: int, eps: float, add_residual: bool = False):
    """Same math in XLA (CPU path + VJP), on the M/Vo form."""
    bt, s, c = x.shape
    hk = m.shape[-1]
    heads = hk // SKV_PAD
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    hn = (xf - mu) * jax.lax.rsqrt(var + eps)
    hn = (hn * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(x.dtype)
    m_rep = jnp.repeat(m, t_repeat, axis=0).astype(x.dtype)
    vo_rep = jnp.repeat(vo, t_repeat, axis=0).astype(x.dtype)
    scores = jnp.einsum("bsc,bck->bsk", hn, m_rep,
                        preferred_element_type=jnp.float32)
    scores = (scores + pad_bias.astype(jnp.float32)
              ).reshape(bt, s, heads, SKV_PAD)
    scores = scores - jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
    probs = jax.nn.softmax(scores, axis=-1).reshape(bt, s, hk).astype(x.dtype)
    out = jnp.einsum("bsk,bkc->bsc", probs, vo_rep,
                     preferred_element_type=jnp.float32)
    out = out + bo.astype(jnp.float32)
    if add_residual:
        out = out + xf
    return out.astype(x.dtype)


def _row_block(s: int, c: int) -> int:
    r = 512 if c <= 512 else 256
    while s % r:
        r //= 2
    return r


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused(x, ln_scale, ln_bias, m, vo, pad_bias, bo, t_repeat, eps,
           add_residual):
    return _fused_impl(x, ln_scale, ln_bias, m, vo, pad_bias, bo, t_repeat,
                       eps, add_residual)


def _fused_impl(x, ln_scale, ln_bias, m, vo, pad_bias, bo, t_repeat, eps,
                add_residual=False):
    bt, s, c = x.shape
    hk = m.shape[-1]
    heads = hk // SKV_PAD
    r = _row_block(s, c)
    cdt = x.dtype

    grid = (bt, s // r)
    blk_x = pl.BlockSpec((1, r, c), lambda i, p: (i, p, 0))
    blk_c = pl.BlockSpec((1, c), lambda i, p: (0, 0))
    blk_m = pl.BlockSpec((1, c, hk), lambda i, p: (i // t_repeat, 0, 0))
    blk_vo = pl.BlockSpec((1, hk, c), lambda i, p: (i // t_repeat, 0, 0))
    blk_pb = pl.BlockSpec((1, hk), lambda i, p: (0, 0))

    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, eps=eps,
                          add_residual=add_residual),
        grid=grid,
        in_specs=[blk_x, blk_c, blk_c, blk_m, blk_vo, blk_pb, blk_c],
        out_specs=blk_x,
        out_shape=jax.ShapeDtypeStruct((bt, s, c), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, ln_scale.reshape(1, c).astype(cdt), ln_bias.reshape(1, c).astype(cdt),
      m.astype(cdt), vo.astype(cdt), pad_bias.reshape(1, hk),
      bo.reshape(1, c).astype(cdt))


def _fused_fwd(x, ln_scale, ln_bias, m, vo, pad_bias, bo, t_repeat, eps,
               add_residual):
    out = _fused_impl(x, ln_scale, ln_bias, m, vo, pad_bias, bo, t_repeat,
                      eps, add_residual)
    return out, (x, ln_scale, ln_bias, m, vo, pad_bias, bo)


def _fused_bwd(t_repeat, eps, add_residual, res, g):
    (x, ln_scale, ln_bias, m, vo, pad_bias, bo) = res
    _, vjp = jax.vjp(
        lambda x_, lns, lnb, m_, vo_, bo_: _reference(
            x_, lns, lnb, m_, vo_, pad_bias, bo_, t_repeat, eps,
            add_residual),
        x, ln_scale, ln_bias, m, vo, bo)
    dx, dlns, dlnb, dm, dvo, dbo = vjp(g)
    return dx, dlns, dlnb, dm, dvo, jnp.zeros_like(pad_bias), dbo


_fused.defvjp(_fused_fwd, _fused_bwd)


def cross_attention_block_fits(x_shape, skv: int, heads: int,
                               dim_head: int) -> bool:
    bt, s, c = x_shape
    if skv > SKV_PAD or c % 128 or heads * dim_head != c:
        return False
    # measured on v5e: wins at c=512 (L1 61.5 vs 63.0 ms, L2 16.2 vs 16.6),
    # loses at c=1024/S=1024 (L3 14.0 vs 12.1) — the M/Vo matmuls grow ∝C·H
    # while XLA's chain shrinks with S
    if c > 512:
        return False
    r = _row_block(s, c)
    return s % r == 0 and r >= 8


def fused_cross_attention_block(
    x: jax.Array,            # (B·T, S, C) pre-norm hidden states
    ln_scale: jax.Array, ln_bias: jax.Array,
    wq: jax.Array,           # (C, H·D) — q projection (no bias in released cfg)
    k: jax.Array,            # (B, Skv, H·D) projected keys (unrepeated)
    v: jax.Array,            # (B, Skv, H·D) projected values
    wo: jax.Array,           # (H·D, C) out projection
    bo: jax.Array,           # (C,)
    *,
    heads: int,
    dim_head: int,
    t_repeat: int,
    eps: float = 1e-5,
    use_pallas: Optional[bool] = None,
    add_residual: bool = False,
) -> jax.Array:
    """Returns the attention delta LN→attn→proj(x), or x + delta when
    ``add_residual`` (exact/no-PAB path) — caller adds the residual otherwise.

    ``t_repeat``: how many consecutive x batch rows share one k/v batch entry
    (= video_length; the text context is per-clip, not per-frame)."""
    bt, s, c = x.shape
    b, skv, _ = k.shape
    assert bt == b * t_repeat, (bt, b, t_repeat)
    scale = jnp.asarray(dim_head ** -0.5, jnp.float32)

    # fold q-proj into the keys and out-proj into the values (f32, then bf16)
    wq_h = wq.astype(jnp.float32).reshape(c, heads, dim_head) * scale
    kh = k.astype(jnp.float32).reshape(b, skv, heads, dim_head)
    m = jnp.einsum("chd,bkhd->bchk", wq_h, kh)             # (B, C, H, Skv)
    m = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, SKV_PAD - skv)))
    m = m.reshape(b, c, heads * SKV_PAD)

    vh = v.astype(jnp.float32).reshape(b, skv, heads, dim_head)
    wo_h = wo.astype(jnp.float32).reshape(heads, dim_head, c)
    vo = jnp.einsum("bkhd,hdc->bhkc", vh, wo_h)            # (B, H, Skv, C)
    vo = jnp.pad(vo, ((0, 0), (0, 0), (0, SKV_PAD - skv), (0, 0)))
    vo = vo.reshape(b, heads * SKV_PAD, c)

    pad_bias = jnp.where(
        (jnp.arange(heads * SKV_PAD) % SKV_PAD) < skv, 0.0, NEG
    ).astype(jnp.float32)

    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and cross_attention_block_fits(x.shape, skv, heads,
                                                     dim_head))
    if not use_pallas:
        return _reference(x, ln_scale, ln_bias, m, vo, pad_bias, bo,
                          t_repeat, eps, add_residual)
    return _fused(x, ln_scale, ln_bias, m, vo, pad_bias, bo, int(t_repeat),
                  float(eps), bool(add_residual))
