"""Fused Pallas kernel for tiny-sequence (temporal) attention.

The temporal attention (ref attention.py:626-733) is S=8 attention over a
batch of batch·pixels rows. ops/attention.attention_packed_small already packs
128/S batch elements per MXU tile, but as XLA ops it still round-trips the
packed fp32 scores and the layout transposes through HBM (~30 ms at the 128²
level). This kernel does the whole thing in one pass: each program reads a
(128, H, D) block of q/k/v, computes per-head packed scores + block-diagonal
bias + softmax + PV entirely in VMEM, and writes the (128, H, D) output —
q/k/v/out cross HBM exactly once (speed-of-light for this op).

Layout contract: q/k/v are (B, S, H, D) with rows flattened as (B·S, H, D);
a 128-row block therefore holds 128/S whole batch elements. The per-head
rel-pos bias (H, S, S) is pre-tiled into a block-diagonal (H, 128, 128) map
with off-block entries at a large negative value, so masking and bias are one
add. Differentiable via custom VJP (recompute backward through the XLA
expression).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0.7 * float(np.finfo(np.float32).max)
ROWS = 128          # packed attention tile: 128/S batch elements × S frames
ROW_BLOCK = 2048    # rows DMA'd per program (amortizes per-program latency)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # blocks: q/k/v/o (1, ROW_BLOCK, D) at (head, row-tile); bias
    # (1, ROWS, ROWS) at (head,). The leading singleton keeps every
    # load/store rank-stable (Mosaic rejects rank-changing middle-index
    # slices); the in-kernel loop walks 128-row attention tiles so one
    # program does ROW_BLOCK/128 tiles' work per DMA.
    bias = bias_ref[0]
    for i in range(ROW_BLOCK // ROWS):
        sl = pl.dslice(i * ROWS, ROWS)
        q = q_ref[0, sl, :]  # (ROWS, D)
        k = k_ref[0, sl, :]
        v = v_ref[0, sl, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias  # bias + block-diagonal mask in one add
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p / l
        o_ref[0, sl, :] = jax.lax.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _reference(q, k, v, bias):
    """Plain-XLA semantics: softmax over S keys per (batch, head, query)."""
    scores = jnp.einsum("bihd,bjhd->bhij", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias[None].astype(jnp.float32)
    scores = scores - jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _build_bias_full(bias, heads: int, s: int) -> jax.Array:
    """(H, ROWS, ROWS) block-diagonal bias-plus-mask map."""
    blk = jnp.arange(ROWS) // s
    allowed = blk[:, None] == blk[None, :]
    if bias is None:
        tiled = jnp.zeros((heads, ROWS, ROWS), jnp.float32)
    else:
        tiled = jnp.tile(bias.reshape(heads, s, s).astype(jnp.float32),
                         (1, ROWS // s, ROWS // s))
    return jnp.where(allowed[None], tiled, jnp.float32(NEG))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused(q, k, v, bias_full):
    b, s, h, d = q.shape
    rows = b * s

    def to_hrd(x):  # (B, S, H, D) → (H, rows, D)
        return x.reshape(rows, h, d).transpose(1, 0, 2)

    qf, kf, vf = to_hrd(q), to_hrd(k), to_hrd(v)
    spec = pl.BlockSpec((1, ROW_BLOCK, d), lambda hh, r: (hh, r, 0))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((h, rows, d), q.dtype),
        grid=(h, rows // ROW_BLOCK),
        in_specs=[
            spec, spec, spec,
            pl.BlockSpec((1, ROWS, ROWS), lambda hh, r: (hh, 0, 0)),
        ],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qf, kf, vf, bias_full)
    return out.transpose(1, 0, 2).reshape(b, s, h, d)


def _fused_fwd(q, k, v, bias_full):
    return _fused(q, k, v, bias_full), (q, k, v, bias_full)


def _fused_bwd(res, g):
    q, k, v, bias_full = res
    s = q.shape[1]
    # recover the (H, S, S) bias from the first diagonal block (exact: the
    # map is block-diagonal tiles of it)
    bias = bias_full[:, :s, :s]
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, bias), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(bias_full)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_temporal_attention_fits(b: int, s: int, h: int, d: int) -> bool:
    return (ROWS % s == 0 and d % 64 == 0 and d <= 256
            and b * s >= ROW_BLOCK)


def fused_temporal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """q/k/v: (B, S, H, D), scale pre-applied to q; bias: (H, S, S) or None.
    Returns (B, S, H, D)."""
    b, s, h, d = q.shape
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and fused_temporal_attention_fits(b, s, h, d))
    if not use_pallas:
        return _reference(q, k, v, bias)

    group = ROW_BLOCK // s  # batch elements per program
    b_pad = (b + group - 1) // group * group
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    bias_full = _build_bias_full(bias, h, s)
    out = _fused(q, k, v, bias_full)
    return out[:b]
