"""Fused LN → QKV(+RoPE) → packed temporal attention → out-proj kernel.

The temporal attention (ref attention.py:626-733) runs T=8-frame attention
per pixel. The module path (nn/attention.py BasicTransformerBlock) pays two
full transposes of the token tensor ((B·T,S,C) ⇄ (B·S,T,C)), a LayerNorm,
three projections, head split/merge and the packed-attention kernel — ~10
HBM passes. This kernel does the whole block in ONE pass over the tokens in
their native (B, T, S, C) layout:

- each program reads an (T, r, C) tile, LayerNorms rows, projects q/k/v
  (dense (T·r, C)@(C, C) GEMMs — full MXU tiles);
- RoPE is applied in-register: rotate_half is a ±1 lane roll + parity masks
  (interleaved pairs never straddle the 64-lane head boundary, so a plain
  lane roll is exact), with (T, C) cos/sin tables precomputed outside;
- the t-major→s-major reorder that the packed attention needs becomes an
  in-VMEM sublane permute of the q/k/v tiles (the HBM transpose disappears);
- per head / per 128-row tile: scores + block-diagonal T5-bias/mask + softmax
  + PV exactly as ops/fused_temporal_attention.py;
- the output is permuted back, projected, and written as the (T, r, C) delta
  (residual add stays in XLA).

q is pre-scaled by D^-0.5 via the weights (the reference scales before RoPE;
rotation preserves norms so the fold is exact, attention.py:705).
Differentiable via custom VJP (recompute through the XLA reference).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_temporal_attention import _build_bias_full, _reference as _attn_ref
from .rope import apply_rotary

ROWS = 128
_VMEM_LIMIT = 100 * 1024 * 1024


def _rope_tables(t: int, c: int, heads: int, rot_dim: int, theta: float):
    """(T, C) cos/sin with per-head tiling; identity (cos=1, sin=0) outside
    the first rot_dim lanes of each head."""
    d = c // heads
    lane = np.arange(c) % d
    in_rope = lane < rot_dim
    freqs = 1.0 / (theta ** ((lane - lane % 2).astype(np.float64) / rot_dim))
    pos = np.arange(t, dtype=np.float64)[:, None]
    ang = pos * freqs[None, :]
    cos = np.where(in_rope[None, :], np.cos(ang), 1.0).astype(np.float32)
    sin = np.where(in_rope[None, :], np.sin(ang), 0.0).astype(np.float32)
    return jnp.asarray(cos), jnp.asarray(sin)


def _kernel(x_ref, lns_ref, lnb_ref, cos_ref, sin_ref, wq_ref, wk_ref,
            wv_ref, wo_ref, bo_ref, bias_ref, o_ref,
            *, t: int, r: int, heads: int, rot_dim: int, eps: float,
            add_residual: bool):
    c = x_ref.shape[-1]
    d = c // heads
    x = x_ref[0].astype(jnp.float32).reshape(t * r, c)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
    hn = (x - mu) * jax.lax.rsqrt(var + eps)
    hn = hn * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    hn = hn.astype(o_ref.dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    in_rope = (lane % d) < rot_dim
    even = (lane % 2) == 0

    def rope(p):
        """p: (T·r, C) f32 → rotated, using the (T, C) tables."""
        pr = p.reshape(t, r, c)
        rot_m1 = pltpu.roll(p, c - 1, 1)   # x[j+1] at lane j (circular −1)
        rot_p1 = pltpu.roll(p, 1, 1)       # x[j-1] at lane j
        half = jnp.where(jnp.logical_and(in_rope, even), -rot_m1,
                         jnp.where(jnp.logical_and(in_rope, ~even), rot_p1,
                                   0.0)).reshape(t, r, c)
        cos = cos_ref[...][:, None, :]
        sin = sin_ref[...][:, None, :]
        return (pr * cos + half * sin).reshape(t * r, c)

    q = jax.lax.dot(hn, wq_ref[...], preferred_element_type=jnp.float32)
    k = jax.lax.dot(hn, wk_ref[...], preferred_element_type=jnp.float32)
    v = jax.lax.dot(hn, wv_ref[...], preferred_element_type=jnp.float32)
    q = rope(q)
    k = rope(k)

    # t-major → s-major rows for the packed 128-row attention tiles
    def to_smajor(p):
        return jnp.swapaxes(p.reshape(t, r, c), 0, 1).reshape(r * t, c)

    qs = to_smajor(q).astype(o_ref.dtype)
    ks = to_smajor(k).astype(o_ref.dtype)
    vs = to_smajor(v).astype(o_ref.dtype)

    n_tiles = (r * t) // ROWS
    head_outs = []
    for h in range(heads):
        qh = qs[:, h * d:(h + 1) * d]
        kh = ks[:, h * d:(h + 1) * d]
        vh = vs[:, h * d:(h + 1) * d]
        bias = bias_ref[h]
        tiles = []
        for i in range(n_tiles):
            sl = slice(i * ROWS, (i + 1) * ROWS)
            s = jax.lax.dot_general(qh[sl], kh[sl], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + bias
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            p = (p / l).astype(o_ref.dtype)
            tiles.append(jax.lax.dot(p, vh[sl],
                                     preferred_element_type=jnp.float32))
        head_outs.append(jnp.concatenate(tiles, axis=0))  # (r·t, D)
    outs = jnp.concatenate(head_outs, axis=1)             # (r·t, C) f32

    # back to t-major, project
    outt = jnp.swapaxes(outs.reshape(r, t, c), 0, 1).reshape(t * r, c)
    delta = jax.lax.dot(outt.astype(o_ref.dtype), wo_ref[...],
                        preferred_element_type=jnp.float32)
    delta = delta + bo_ref[0].astype(jnp.float32)
    if add_residual:
        delta = delta + x  # x already in VMEM: kills the standalone XLA add
    o_ref[0] = delta.astype(o_ref.dtype).reshape(t, r, c)


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    hn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (hn * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _reference(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss,
               video_length: int, rot_dim: int, eps: float,
               add_residual: bool = False):
    """XLA math of the whole block (CPU path + VJP): exactly what the module
    path computes (nn/attention.py BasicTransformerBlock temporal step)."""
    bt, s, c = x.shape
    b = bt // video_length
    heads = bias_hss.shape[0]
    d = c // heads
    xt = x.reshape(b, video_length, s, c).transpose(0, 2, 1, 3)
    xt = xt.reshape(b * s, video_length, c)
    hn = _ln(xt, ln_scale, ln_bias, eps)
    q = (hn @ wq.astype(x.dtype)).reshape(b * s, video_length, heads, d)
    k = (hn @ wk.astype(x.dtype)).reshape(b * s, video_length, heads, d)
    v = (hn @ wv.astype(x.dtype)).reshape(b * s, video_length, heads, d)
    q = q * (d ** -0.5)
    q = apply_rotary(q, rot_dim=min(rot_dim, d), seq_axis=-3)
    k = apply_rotary(k, rot_dim=min(rot_dim, d), seq_axis=-3)
    out = _attn_ref(q, k, v, bias_hss)                    # (b·s, T, H, D)
    out = out.reshape(b * s, video_length, c)
    delta = out @ wo.astype(x.dtype) + bo.astype(x.dtype)
    delta = delta.reshape(b, s, video_length, c).transpose(0, 2, 1, 3)
    delta = delta.reshape(bt, s, c)
    return delta + x if add_residual else delta


def _row_block(s: int, t: int, c: int) -> int:
    r = 256 if c <= 512 else 128
    while r > 1 and (s % r or (r * t) % ROWS):
        r //= 2
    return r if (s % r == 0 and (r * t) % ROWS == 0) else 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _fused(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss,
           video_length, rot_dim, eps, add_residual):
    return _fused_impl(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss,
                       video_length, rot_dim, eps, add_residual)


def _fused_impl(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss,
                video_length, rot_dim, eps, add_residual=False):
    bt, s, c = x.shape
    t = video_length
    b = bt // t
    heads = bias_hss.shape[0]
    d = c // heads
    r = _row_block(s, t, c)
    cdt = x.dtype

    cos, sin = _rope_tables(t, c, heads, min(rot_dim, d), 10000.0)
    bias_full = _build_bias_full(bias_hss, heads, t)       # (H, 128, 128)
    wq_s = (wq.astype(jnp.float32) * (d ** -0.5)).astype(cdt)

    x4 = x.reshape(b, t, s, c)
    grid = (b, s // r)
    blk_x = pl.BlockSpec((1, t, r, c), lambda i, p: (i, 0, p, 0))
    blk_c = pl.BlockSpec((1, c), lambda i, p: (0, 0))
    blk_tc = pl.BlockSpec((t, c), lambda i, p: (0, 0))
    blk_w = pl.BlockSpec((c, c), lambda i, p: (0, 0))
    blk_bias = pl.BlockSpec((heads, ROWS, ROWS), lambda i, p: (0, 0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, t=t, r=r, heads=heads,
                          rot_dim=min(rot_dim, d), eps=eps,
                          add_residual=add_residual),
        grid=grid,
        in_specs=[blk_x, blk_c, blk_c, blk_tc, blk_tc, blk_w, blk_w, blk_w,
                  blk_w, blk_c, blk_bias],
        out_specs=blk_x,
        out_shape=jax.ShapeDtypeStruct((b, t, s, c), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x4, ln_scale.reshape(1, c).astype(cdt), ln_bias.reshape(1, c).astype(cdt),
      cos, sin, wq_s, wk.astype(cdt), wv.astype(cdt), wo.astype(cdt),
      bo.reshape(1, c).astype(cdt), bias_full)
    return out.reshape(bt, s, c)


def _fused_fwd(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss,
               video_length, rot_dim, eps, add_residual):
    out = _fused_impl(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss,
                      video_length, rot_dim, eps, add_residual)
    return out, (x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss)


def _fused_bwd(video_length, rot_dim, eps, add_residual, res, g):
    x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, video_length, rot_dim, eps, add_residual),
        x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def temporal_attention_block_fits(x_shape, video_length: int, heads: int) -> bool:
    bt, s, c = x_shape
    t = video_length
    if bt % t or c % 128 or c % heads or (c // heads) % 64:
        return False
    if ROWS % t:
        return False
    r = _row_block(s, t, c)
    return r >= 8


def fused_temporal_attention_block(
    x: jax.Array,                    # (B·T, S, C) pre-norm hidden states
    ln_scale: jax.Array, ln_bias: jax.Array,
    wq: jax.Array, wk: jax.Array, wv: jax.Array,   # (C, C), no bias
    wo: jax.Array, bo: jax.Array,                  # (C, C), (C,)
    bias_hss: jax.Array,             # (H, T, T) T5 rel-pos bias
    *,
    video_length: int,
    rot_dim: int = 32,
    eps: float = 1e-5,
    use_pallas: Optional[bool] = None,
    add_residual: bool = False,
) -> jax.Array:
    """Returns the temporal-attention delta in the (B·T, S, C) layout, or
    x + delta when ``add_residual`` (exact/no-PAB path). Same math as the
    module chain norm_temporal→TemporalAttention (incl. its transposes)."""
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and temporal_attention_block_fits(
                          x.shape, video_length, bias_hss.shape[0]))
    if not use_pallas:
        return _reference(x, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                          bias_hss, video_length, rot_dim, eps, add_residual)
    return _fused(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, bias_hss,
                  video_length, rot_dim, eps, bool(add_residual))
