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
    acc_ref[0, :] += jnp.sum(s1, axis=0)
    acc_ref[1, :] += jnp.sum(s2, axis=0)

    @pl.when(t == nt - 1)
    def _store():
        out_ref[0] = acc_ref[...]


def _apply_kernel(x_ref, stats_ref, scale_ref, bias_ref, out_ref, *,
                  rows: int, group_size: int, eps: float, act: str):
    """y = act((x - µ)·rstd·γ + β). grid (N, num_row_tiles)."""
    x = x_ref[0].astype(jnp.float32)  # (block_rows, C)
    c = x.shape[-1]
    g = c // group_size
    n_per_group = rows * group_size

    s1 = stats_ref[0, 0]  # (G,)
    s2 = stats_ref[0, 1]
    mean = s1 / n_per_group
    var = s2 / n_per_group - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    mean_c = jnp.repeat(mean, group_size, axis=0)  # (C,)
    rstd_c = jnp.repeat(rstd, group_size, axis=0)
    gamma = scale_ref[...].astype(jnp.float32)
    beta = bias_ref[...].astype(jnp.float32)

    y = (x - mean_c[None, :]) * rstd_c[None, :] * gamma[None, :] + beta[None, :]
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

    out = pl.pallas_call(
        functools.partial(_apply_kernel, rows=rows, group_size=gs, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((n, rows_pad, c), x2d.dtype),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, 2, num_groups), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i, t: (0,)),
            pl.BlockSpec((c,), lambda i, t: (0,)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, c), lambda i, t: (i, t, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x2d, stats, scale, bias)
    return out[:, :rows]


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
    matching torch GroupNorm on 4-D/5-D inputs.
    """
    n = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu" and c % 128 == 0

    if not use_pallas:
        gs = c // num_groups
        xg = x.reshape(n, -1, num_groups, gs).astype(jnp.float32)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        y = (xg - mean) * jax.lax.rsqrt(var + eps)
        y = y.reshape(x.shape) * scale + bias
        if act == "silu":
            y = jax.nn.silu(y)
        return y.astype(x.dtype)

    x2d = x.reshape(n, -1, c)
    out = _fused_gn_tpu(x2d, scale, bias, num_groups, float(eps), act or "none",
                        block_rows)
    return out.reshape(x.shape)
