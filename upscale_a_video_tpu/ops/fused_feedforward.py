"""Fused LN → GEGLU → out-proj Pallas kernel for the transformer FF.

The FF (ref attention.py:493-494,563: LayerNorm → Dense(C→8C) → split →
h·gelu(gate) → Dense(4C→C)) is FLOP-heavy but XLA still spends ~40% of its
time on HBM round-trips of the LN output and the (r, 8C) GEGLU intermediate.
One program here reads an (r, C) tile of the pre-norm hidden states, runs the
whole chain in VMEM (weights are grid-constant), and writes the (r, C) delta.
Traffic: 1 read + 1 write of the token activations (vs ~6 passes), GEMMs at
dense-matmul utilization.

Differentiable via custom VJP (recompute through the XLA reference).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _kernel(x_ref, lns_ref, lnb_ref, w1a_ref, w1b_ref, b1a_ref, b1b_ref,
            w2_ref, b2_ref, o_ref, *, eps: float, add_residual: bool):
    x = x_ref[0].astype(jnp.float32)                        # (r, C)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
    hn = (x - mu) * jax.lax.rsqrt(var + eps)
    hn = hn * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    hn = hn.astype(o_ref.dtype)

    h = jax.lax.dot(hn, w1a_ref[...], preferred_element_type=jnp.float32)
    h = h + b1a_ref[0].astype(jnp.float32)
    g = jax.lax.dot(hn, w1b_ref[...], preferred_element_type=jnp.float32)
    g = g + b1b_ref[0].astype(jnp.float32)
    m = (h * jax.nn.gelu(g)).astype(o_ref.dtype)            # (r, 4C)
    out = jax.lax.dot(m, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[0].astype(jnp.float32)
    if add_residual:
        # x is already in VMEM — folding the residual here removes the
        # standalone XLA add (one extra read+write of the token activations
        # per FF, measured ~1-4 ms each at the 320² UNet levels)
        out = out + x
    o_ref[0] = out.astype(o_ref.dtype)


def _reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float,
               add_residual: bool = False):
    """XLA math identical to LayerNorm + GEGLU + Dense (nn/attention.py)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    hn = (xf - mu) * jax.lax.rsqrt(var + eps)
    hn = (hn * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(x.dtype)
    h = hn @ w1.astype(x.dtype) + b1.astype(x.dtype)
    a, g = jnp.split(h, 2, axis=-1)
    m = a * jax.nn.gelu(g)
    out = m @ w2.astype(x.dtype) + b2.astype(x.dtype)
    return out + x if add_residual else out


def _row_block(s: int, c: int) -> int:
    r = 256 if c <= 512 else 128
    while s % r:
        r //= 2
    return r


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, add_residual):
    return _fused_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, add_residual)


def _fused_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, add_residual=False):
    bt, s, c = x.shape
    hid = w2.shape[0]                                       # 4C
    r = _row_block(s, c)
    cdt = x.dtype

    w1a, w1b = w1[:, :hid], w1[:, hid:]
    b1a, b1b = b1[:hid], b1[hid:]

    grid = (bt, s // r)
    blk_x = pl.BlockSpec((1, r, c), lambda i, p: (i, p, 0))
    blk_c = pl.BlockSpec((1, c), lambda i, p: (0, 0))
    blk_h = pl.BlockSpec((1, hid), lambda i, p: (0, 0))
    blk_w1 = pl.BlockSpec((c, hid), lambda i, p: (0, 0))
    blk_w2 = pl.BlockSpec((hid, c), lambda i, p: (0, 0))

    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, add_residual=add_residual),
        grid=grid,
        in_specs=[blk_x, blk_c, blk_c, blk_w1, blk_w1, blk_h, blk_h,
                  blk_w2, blk_c],
        out_specs=blk_x,
        out_shape=jax.ShapeDtypeStruct((bt, s, c), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, ln_scale.reshape(1, c).astype(cdt), ln_bias.reshape(1, c).astype(cdt),
      w1a.astype(cdt), w1b.astype(cdt), b1a.reshape(1, hid).astype(cdt),
      b1b.reshape(1, hid).astype(cdt), w2.astype(cdt),
      b2.reshape(1, c).astype(cdt))


def _fused_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, add_residual):
    out = _fused_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, add_residual)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fused_bwd(eps, add_residual, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, eps, add_residual),
        x, ln_scale, ln_bias, w1, b1, w2, b2)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def feedforward_fits(x_shape) -> bool:
    bt, s, c = x_shape
    if c % 128 or c > 1024:
        return False
    r = _row_block(s, c)
    return s % r == 0 and r >= 8


def fused_feedforward(
    x: jax.Array,                 # (B·T, S, C) pre-norm hidden states
    ln_scale: jax.Array, ln_bias: jax.Array,
    w1: jax.Array, b1: jax.Array,  # (C, 8C), (8C,) — GEGLU proj
    w2: jax.Array, b2: jax.Array,  # (4C, C), (C,)  — out proj
    *,
    eps: float = 1e-5,
    use_pallas: Optional[bool] = None,
    add_residual: bool = False,
) -> jax.Array:
    """Returns the FF delta, or x + delta when ``add_residual`` (the
    residual add rides the kernel's existing VMEM copy of x — used on the
    exact/no-PAB path where the delta is not needed separately)."""
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and feedforward_fits(x.shape))
    if not use_pallas:
        return _reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps,
                          add_residual)
    return _fused(x, ln_scale, ln_bias, w1, b1, w2, b2, float(eps),
                  bool(add_residual))
