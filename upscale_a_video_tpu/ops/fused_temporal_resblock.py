"""Fused temporal resblock: GN→SiLU→conv(k,1,1)→(+temb)→GN→SiLU→conv(3,1,1)→+x.

The reference's temporal resblocks (ResnetBlock3DCNN, resnet.py:297-393, used
by TemporalModule3D temporal_module.py:137 and Transformer3DModel
attention.py:323) chain two GroupNorms and two (k,1,1) temporal convs. XLA
runs the convs at ~36% MXU and round-trips every elementwise stage through
HBM; a standalone Pallas conv kernel was measured FASTER alone but SLOWER
end-to-end because the opaque kernel boundary broke XLA's elementwise fusion
(ops/temporal_conv.py note). This module fuses the *whole resblock* so there
is no boundary left to lose:

    stats1  (XLA)    : GroupNorm mean/rstd of x per (B,T,G)   — 1 read of x
    K1      (Pallas) : h1 = conv1(silu(gn1(x))) + b1 + temb   — read x, write h1
                       + per-(B,T,G) partial sums of h1, h1²  (for GN2 stats,
                       accumulated across the spatial grid; group reduction is
                       a (T,C)@(C,G) indicator matmul on the MXU)
    stats2  (XLA)    : finalize GN2 mean/rstd from the partials (no h1 read)
    K2      (Pallas) : out = x + conv2(silu(gn2(h1))) + b2    — read h1+x, write out

Total HBM traffic: 3 reads + 2 writes of the activation, vs ~9 passes for the
unfused XLA chain. The temporal conv runs as K shifted (T·r, C)@(C, C) GEMMs
entirely in VMEM (a shift of ±1 frame is a jump of exactly r rows in the
flattened block), i.e. at dense-matmul MXU utilization instead of 36%.

Differentiable via custom VJP (backward recomputes through the XLA path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GPAD = 128  # lane-padded group axis for the stats partials


def _row_block(hw: int, c: int) -> int:
    import os
    r = int(os.environ.get("UAV_FTR_ROWS", "1024")) // (c // 128)
    while hw % r:
        r //= 2
    return r


_VMEM_LIMIT = 100 * 1024 * 1024  # v5e/v5p have 128 MiB VMEM; default cap is 16


def _shift_rows(x2d: jax.Array, off: int, r: int) -> jax.Array:
    """Shift the (T·r, C) flattened block by `off` frames (off·r rows),
    filling with zeros: result[t] = x[t + off] (zero outside [0, T))."""
    if off == 0:
        return x2d
    n = x2d.shape[0]
    z = jnp.zeros((abs(off) * r, x2d.shape[1]), x2d.dtype)
    if off > 0:
        return jnp.concatenate([x2d[off * r:], z], axis=0)
    return jnp.concatenate([z, x2d[:off * r]], axis=0)


def _k1_kernel(x_ref, a1_ref, d1_ref, temb_ref, gind_ref, *w_refs_out,
               k: int, t: int, r: int, has_temb: bool):
    w_refs = w_refs_out[:k]
    b1_ref = w_refs_out[k]
    h1_ref, part_ref = w_refs_out[k + 1], w_refs_out[k + 2]

    c = x_ref.shape[-1]
    x = x_ref[0].astype(jnp.float32).reshape(t * r, c)   # (T·r, C)
    xn = x * a1_ref[0].astype(jnp.float32) + d1_ref[0].astype(jnp.float32)
    xn = (xn * jax.nn.sigmoid(xn)).astype(h1_ref.dtype)  # silu, bf16 for MXU
    xf = xn

    pad = (k - 1) // 2
    acc = None
    for i in range(k):
        tap = jax.lax.dot(_shift_rows(xf, i - pad, r), w_refs[i][...],
                          preferred_element_type=jnp.float32)
        acc = tap if acc is None else acc + tap
    acc = acc + b1_ref[0].astype(jnp.float32)
    if has_temb:
        acc = acc + temb_ref[0].astype(jnp.float32)
    h1 = acc.astype(h1_ref.dtype)
    h1_ref[0] = h1.reshape(t, r, c)

    # GN2 partials: per-group sums of h1 and h1² over this block's rows
    # (GroupNorm on 5-D video reduces over T, H, W and C/G — torch
    # resnet.py:297-393 semantics). Row-reduce to (1, C), then group-reduce
    # via the 0/1 indicator matmul.
    hf = h1.astype(jnp.float32)
    s1 = jnp.sum(hf, axis=0, keepdims=True)              # (1, C)
    s2 = jnp.sum(hf * hf, axis=0, keepdims=True)
    gind = gind_ref[...].astype(jnp.float32)             # (C, GPAD)
    p1 = jax.lax.dot(s1, gind, preferred_element_type=jnp.float32)
    p2 = jax.lax.dot(s2, gind, preferred_element_type=jnp.float32)
    part = jnp.concatenate([p1, p2], axis=0)[None]       # (1, 2, GPAD)

    @pl.when(pl.program_id(1) == 0)
    def _():
        part_ref[...] = jnp.zeros_like(part_ref)

    part_ref[...] += part


def _k2_kernel(x_ref, h1_ref, a2_ref, d2_ref, *w_refs_out,
               k: int, t: int, r: int):
    w_refs = w_refs_out[:k]
    b2_ref = w_refs_out[k]
    out_ref = w_refs_out[k + 1]

    c = h1_ref.shape[-1]
    h = h1_ref[0].astype(jnp.float32).reshape(t * r, c)
    hn = h * a2_ref[0].astype(jnp.float32) + d2_ref[0].astype(jnp.float32)
    hn = (hn * jax.nn.sigmoid(hn)).astype(out_ref.dtype)
    hf = hn

    pad = (k - 1) // 2
    acc = None
    for i in range(k):
        tap = jax.lax.dot(_shift_rows(hf, i - pad, r), w_refs[i][...],
                          preferred_element_type=jnp.float32)
        acc = tap if acc is None else acc + tap
    acc = acc + b2_ref[0].astype(jnp.float32)
    out = x_ref[0].astype(jnp.float32) + acc.reshape(t, r, c)
    out_ref[0] = out.astype(out_ref.dtype)


def _gn_affine(x, scale, bias, groups: int, eps: float):
    """GroupNorm folded to a per-(B,C) affine: y = x·a + d. Stats reduce over
    (T, H, W, C/G) per (B, G) — torch 5-D GroupNorm semantics (the reference
    normalizes the whole clip, resnet.py:297-393; flax GroupNorm on
    channels-last video does the same). fp32 stats on bf16 inputs."""
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t * h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3))                     # (B, G)
    var = jnp.mean(jnp.square(xf), axis=(1, 3)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    a = jnp.repeat(rstd, c // groups, axis=-1) * scale.astype(jnp.float32)
    d = bias.astype(jnp.float32) - jnp.repeat(
        mean * rstd, c // groups, axis=-1) * scale.astype(jnp.float32)
    return a, d


def _affine_from_partials(part, n_rows: int, groups: int, c: int, eps: float,
                          scale, bias):
    """(B, 2, GPAD) partial sums → per-(B,C) affine for GN2."""
    s1 = part[:, 0, :groups]
    s2 = part[:, 1, :groups]
    n = n_rows * (c // groups)
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    a = jnp.repeat(rstd, c // groups, axis=-1) * scale.astype(jnp.float32)
    d = bias.astype(jnp.float32) - jnp.repeat(
        mean * rstd, c // groups, axis=-1) * scale.astype(jnp.float32)
    return a, d


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(11, 12, 13, 14),
)
def _fused(x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale, n2_bias, w2,
           b2, gind, groups1, groups2, eps, out_dtype_name):
    return _fused_impl(x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale,
                       n2_bias, w2, b2, gind, groups1, groups2, eps,
                       out_dtype_name)


def _fused_impl(x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale, n2_bias,
                w2, b2, gind, groups1, groups2, eps, out_dtype_name):
    out_dtype = jnp.dtype(out_dtype_name)
    b, t, hgt, wid, c = x.shape
    hw = hgt * wid
    r = _row_block(hw, c)
    bpt = hw // r
    k1, k2 = w1.shape[0], w2.shape[0]
    has_temb = temb_proj is not None

    a1, d1 = _gn_affine(x, n1_scale, n1_bias, groups1, eps)
    a1 = a1.reshape(b, 1, c)
    d1 = d1.reshape(b, 1, c)

    xr = x.reshape(b, t, hw, c)
    cdt = out_dtype  # compute dtype for MXU operands
    taps1 = [w1[i, 0, 0].astype(cdt) for i in range(k1)]
    taps2 = [w2[i, 0, 0].astype(cdt) for i in range(k2)]
    temb_in = (temb_proj.astype(cdt).reshape(b, 1, c) if has_temb
               else jnp.zeros((b, 1, c), cdt))

    grid = (b, bpt)
    blk_x = pl.BlockSpec((1, t, r, c), lambda i, p: (i, 0, p, 0))
    blk_tc = pl.BlockSpec((1, 1, c), lambda i, p: (i, 0, 0))
    blk_bc = pl.BlockSpec((1, 1, c), lambda i, p: (i, 0, 0))
    blk_w = pl.BlockSpec((c, c), lambda i, p: (0, 0))
    blk_b = pl.BlockSpec((1, 1, c), lambda i, p: (0, 0, 0))
    blk_gi = pl.BlockSpec((c, _GPAD), lambda i, p: (0, 0))
    blk_part = pl.BlockSpec((1, 2, _GPAD), lambda i, p: (i, 0, 0))

    h1, part = pl.pallas_call(
        functools.partial(_k1_kernel, k=k1, t=t, r=r, has_temb=has_temb),
        grid=grid,
        in_specs=[blk_x, blk_tc, blk_tc, blk_bc, blk_gi]
                 + [blk_w] * k1 + [blk_b],
        out_specs=(blk_x, blk_part),
        out_shape=(jax.ShapeDtypeStruct((b, t, hw, c), cdt),
                   jax.ShapeDtypeStruct((b, 2, _GPAD), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(xr.astype(cdt), a1, d1, temb_in, gind.astype(cdt), *taps1,
      b1.reshape(1, 1, c).astype(cdt))

    a2, d2 = _affine_from_partials(part, t * hw, groups2, c, eps,
                                   n2_scale, n2_bias)
    a2 = a2.reshape(b, 1, c)
    d2 = d2.reshape(b, 1, c)

    out = pl.pallas_call(
        functools.partial(_k2_kernel, k=k2, t=t, r=r),
        grid=grid,
        in_specs=[blk_x, blk_x, blk_tc, blk_tc] + [blk_w] * k2 + [blk_b],
        out_specs=blk_x,
        out_shape=jax.ShapeDtypeStruct((b, t, hw, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(xr.astype(cdt), h1, a2, d2, *taps2, b2.reshape(1, 1, c).astype(cdt))

    return out.reshape(b, t, hgt, wid, c)


def fused_temporal_resblock_reference(x, n1_scale, n1_bias, w1, b1, temb_proj,
                                      n2_scale, n2_bias, w2, b2,
                                      groups: int, eps: float,
                                      dtype=None, groups2=None):
    """Plain-XLA reference of the same math (also the backward path)."""
    cdt = dtype or x.dtype
    g2 = groups2 or groups

    def gn(v, scale, bias, grp):
        a, d = _gn_affine(v, scale, bias, grp, eps)
        return (v.astype(jnp.float32) * a[:, None, None, None, :]
                + d[:, None, None, None, :]).astype(cdt)

    def conv(v, w):
        k = w.shape[0]
        return jax.lax.conv_general_dilated(
            v, w.astype(cdt), (1, 1, 1),
            [((k - 1) // 2, (k - 1) // 2), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    h = jax.nn.silu(gn(x, n1_scale, n1_bias, groups))
    h = conv(h, w1) + b1.astype(cdt)
    if temb_proj is not None:
        h = h + temb_proj[:, None, None, None, :].astype(cdt)
    h = jax.nn.silu(gn(h, n2_scale, n2_bias, g2))
    h = conv(h, w2) + b2.astype(cdt)
    return (x.astype(cdt) + h).astype(cdt)


def _fused_fwd(x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale, n2_bias,
               w2, b2, gind, groups1, groups2, eps, out_dtype_name):
    out = _fused_impl(x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale,
                      n2_bias, w2, b2, gind, groups1, groups2, eps,
                      out_dtype_name)
    return out, (x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale, n2_bias,
                 w2, b2)


def _fused_bwd(groups1, groups2, eps, out_dtype_name, res, g):
    (x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale, n2_bias, w2, b2) = res

    def ref(x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale, n2_bias, w2, b2):
        tp = (temb_proj if temb_proj is not None else None)
        return fused_temporal_resblock_reference(
            x, n1_scale, n1_bias, w1, b1, tp, n2_scale, n2_bias, w2, b2,
            groups1, eps, dtype=jnp.dtype(out_dtype_name), groups2=groups2)

    _, vjp = jax.vjp(ref, x, n1_scale, n1_bias, w1, b1, temb_proj,
                     n2_scale, n2_bias, w2, b2)
    grads = vjp(g.astype(jnp.dtype(out_dtype_name)))
    return (*grads, jnp.zeros((x.shape[-1], _GPAD), jnp.float32))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_resblock_fits(x_shape, groups: int, groups2=None) -> bool:
    """Geometry gate: channels that keep K weight taps + the (T·r, C) block
    in VMEM, lane-aligned C, T small enough to hold whole in a block."""
    b, t, h, w, c = x_shape
    hw = h * w
    if c % 128 or c > 512 or c % groups or c % (groups2 or groups):
        return False
    if (groups2 or groups) > _GPAD:
        return False
    if t < 3 or t > 16:
        return False
    r = _row_block(hw, c)
    return hw % r == 0 and hw >= r and r >= 8


def group_indicator(c: int, groups: int) -> np.ndarray:
    """(C, GPAD) 0/1 matrix mapping channels to their group column."""
    ind = np.zeros((c, _GPAD), np.float32)
    per = c // groups
    for g in range(groups):
        ind[g * per:(g + 1) * per, g] = 1.0
    return ind


def fused_temporal_resblock(
    x: jax.Array,
    n1_scale: jax.Array, n1_bias: jax.Array,
    w1: jax.Array, b1: jax.Array,
    temb_proj: Optional[jax.Array],
    n2_scale: jax.Array, n2_bias: jax.Array,
    w2: jax.Array, b2: jax.Array,
    *,
    groups: int,
    groups2: Optional[int] = None,
    eps: float = 1e-6,
    dtype=jnp.bfloat16,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """out = x + conv2(silu(gn2(conv1(silu(gn1(x))) + b1 + temb))) + b2.

    x: (B,T,H,W,C); w1: (k1,1,1,C,C); w2: (k2,1,1,C,C); temb_proj: (B,C)|None.
    Matches _ResnetCore(conv_kind="temporal") with in==out channels
    (ref resnet.py:297-393).
    """
    g2 = groups2 or groups
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and fused_resblock_fits(x.shape, groups, g2))
    if not use_pallas:
        return fused_temporal_resblock_reference(
            x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale, n2_bias,
            w2, b2, groups, eps, dtype=dtype, groups2=g2)
    gind = jnp.asarray(group_indicator(x.shape[-1], g2))
    return _fused(x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale, n2_bias,
                  w2, b2, gind, groups, g2, eps, jnp.dtype(dtype).name)
