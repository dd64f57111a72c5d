"""Fused GroupNorm(+SiLU) Pallas kernels (SURVEY §7 item 1: "fused
GroupNorm+SiLU(+conv epilogue) for hot blocks").

Every resblock begins GN → SiLU → conv (ref resnet.py:264-270). Unfused, XLA
reads the activation three times (mean, variance, normalize) and writes the
SiLU result separately. Here:

- stats kernel: ONE read computing per-(sample, group) Σx and Σx² — the
  channel-group reduction is a 0/1-mask **matmul** so it runs on the MXU with
  fp32 accumulation;
- apply kernel: ONE read + ONE write of ``silu((x-µ)·rstd·γ + β)``.

Net: 2 reads + 1 write vs 3 reads + 1 write, with the activation fused. Both
kernels tile rows (H·W) so arbitrarily large frames stream through VMEM.

Interface is channels-last (N, ..., C) with per-sample stats over all non-C
axes — the torch 5-D GroupNorm semantics used by the resblocks. Falls back to
plain jnp off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _stats_kernel(x_ref, mask_ref, out_ref, acc_ref, *, rows: int, block_rows: int):
    """Accumulate [Σx, Σx²] per group. grid (N, num_row_tiles)."""
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # (block_rows, C)
    # mask padded rows beyond `rows`
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + t * block_rows
    x = jnp.where(row_ids < rows, x, 0.0)
    m = mask_ref[...].astype(jnp.float32)  # (C, G)
    s1 = jax.lax.dot(x, m, preferred_element_type=jnp.float32)       # (block_rows, G)
    s2 = jax.lax.dot(x * x, m, preferred_element_type=jnp.float32)
    acc_ref[0:1, :] += jnp.sum(s1, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(s2, axis=0, keepdims=True)

    @pl.when(t == nt - 1)
    def _store():
        out_ref[0] = acc_ref[...]


def _apply_kernel(x_ref, ab_ref, out_ref, *, act: str):
    """y = act(x·a + b) with per-channel a/b precomputed on host-XLA side
    (folding γ·rstd and β−µ·rstd·γ). Keeping the group→channel expansion out
    of the kernel avoids Mosaic-unsupported vector reshapes (e.g. (G, gs) →
    (1, C)). grid (N, num_row_tiles)."""
    x = x_ref[0].astype(jnp.float32)   # (block_rows, C)
    a = ab_ref[0, 0:1, :]              # (1, C) — slice keeps rank 2
    b = ab_ref[0, 1:2, :]
    y = x * a + b
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "act", "block_rows"))
def _fused_gn_tpu(x2d, scale, bias, num_groups: int, eps: float, act: str,
                  block_rows: int):
    n, rows, c = x2d.shape
    gs = c // num_groups
    rows_pad = _round_up(rows, block_rows)
    if rows_pad != rows:
        x2d = jnp.pad(x2d, ((0, 0), (0, rows_pad - rows), (0, 0)))
    nt = rows_pad // block_rows

    mask = np.zeros((c, num_groups), np.float32)
    for gi in range(num_groups):
        mask[gi * gs:(gi + 1) * gs, gi] = 1.0
    mask = jnp.asarray(mask)

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, rows=rows, block_rows=block_rows),
        out_shape=jax.ShapeDtypeStruct((n, 2, num_groups), jnp.float32),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda i, t: (i, t, 0)),
            pl.BlockSpec((c, num_groups), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, num_groups), lambda i, t: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, num_groups), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x2d, mask)

    # fold stats + affine into per-channel a, b (tiny (N, 2, C) XLA compute):
    # y = (x - µ)·rstd·γ + β = x·(rstd·γ) + (β - µ·rstd·γ)
    n_per_group = rows * gs
    mean = stats[:, 0] / n_per_group                       # (N, G)
    var = stats[:, 1] / n_per_group - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, gs, axis=1)                  # (N, C)
    rstd_c = jnp.repeat(rstd, gs, axis=1)
    a = rstd_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * a
    ab = jnp.stack([a, b], axis=1)                         # (N, 2, C)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((n, rows_pad, c), x2d.dtype),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, 2, c), lambda i, t: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, c), lambda i, t: (i, t, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x2d, ab)
    return out[:, :rows]


def _gn_reference(x, scale, bias, num_groups: int, eps: float, act: str):
    """Plain-XLA GroupNorm(+act), channels-last, torch 5-D semantics."""
    n, c = x.shape[0], x.shape[-1]
    gs = c // num_groups
    xg = x.reshape(n, -1, num_groups, gs).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * scale + bias
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_gn_diff(x2d, scale, bias, num_groups, eps, act, block_rows):
    return _fused_gn_tpu(x2d, scale, bias, num_groups, eps, act, block_rows)


def _fused_gn_diff_fwd(x2d, scale, bias, num_groups, eps, act, block_rows):
    out = _fused_gn_tpu(x2d, scale, bias, num_groups, eps, act, block_rows)
    return out, (x2d, scale, bias)


def _fused_gn_diff_bwd(num_groups, eps, act, block_rows, res, g):
    # recompute-backward through the XLA expression (Pallas kernels are not
    # auto-differentiable); the fused forward still saves the HBM traffic
    x2d, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _gn_reference(x_, s_, b_, num_groups, eps, act),
        x2d, scale, bias)
    return vjp(g)


_fused_gn_diff.defvjp(_fused_gn_diff_fwd, _fused_gn_diff_bwd)


def fused_group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float = 1e-6,
    act: Optional[str] = "silu",
    block_rows: int = 256,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """GroupNorm over all non-batch axes (+optional SiLU), channels-last.

    x: (N, ..., C). Stats per (sample, group) across every non-channel axis,
    matching torch GroupNorm on 4-D/5-D inputs. Differentiable (custom VJP
    with recompute backward)."""
    n = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu" and c % 128 == 0

    if not use_pallas:
        return _gn_reference(x, scale, bias, num_groups, float(eps),
                             act or "none")

    x2d = x.reshape(n, -1, c)
    out = _fused_gn_diff(x2d, scale, bias, num_groups, float(eps),
                         act or "none", block_rows)
    return out.reshape(x.shape)
