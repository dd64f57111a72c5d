"""Pallas TPU kernel for temporal (k,1,1) convolutions on (B,T,H,W,C) video.

The reference's temporal resblocks and modules are built on nn.Conv3d with
kernels (3,1,1)/(5,1,1) (ref resnet.py:332,348, temporal_module.py:138-160).
XLA's native conv runs them at ~36% MXU on v5e (the T window of 8 is tiny and
every reformulation tried — unfold→matmul, folded-2D, shifted GEMMs — was
slower; see scripts/ab_tconv.py). This kernel exploits the layout directly:

with rows flattened as ((b·T + t)·H·W + p, C), a shift of ±1 frame is a jump
of exactly H·W rows — a whole number of row-blocks. Each program reads K
shifted views of the same array (one BlockSpec per tap, block index offset by
o·HW/R), masks taps whose t+o falls outside [0,T) with a scalar factor
computed from program_id, and accumulates K clean (R,C_in)@(C_in,C_out)
GEMMs in fp32. No transposes, no im2col blow-up; x is read K× (block reuse),
out written once.

Differentiable via custom VJP (recompute backward through the XLA conv).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, k: int, t: int, bpt: int):
    # refs: k x-views (R, Cin), k weights (Cin, Cout), out (R, Cout)
    x_refs = refs[:k]
    w_refs = refs[k:2 * k]
    o_ref = refs[2 * k]
    pid = pl.program_id(0)
    t_idx = (pid // bpt) % t
    pad = (k - 1) // 2
    acc = None
    for i in range(k):
        off = i - pad
        valid = jnp.logical_and(t_idx + off >= 0, t_idx + off < t)
        xi = x_refs[i][...] * valid.astype(x_refs[i].dtype)
        tap = jax.lax.dot(xi, w_refs[i][...],
                          preferred_element_type=jnp.float32)
        acc = tap if acc is None else acc + tap
    o_ref[...] = acc.astype(o_ref.dtype)


def _conv_reference(x, w, pad: int):
    """lax conv with NDHWC/DHWIO dims — exactly what nn.Conv lowers to."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(pad, pad), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _row_block(cin: int, hw: int) -> int:
    # keep K weight taps + fp32 accumulator + x block comfortably in VMEM
    return min(1024 if cin <= 512 else 256, hw)


@jax.custom_vjp
def _tconv(x, w):
    b, t, h, wd, cin = x.shape
    k, _, _, _, cout = w.shape
    hw = h * wd
    r = _row_block(cin, hw)
    bpt = hw // r
    nb = b * t * bpt
    pad = (k - 1) // 2

    xf = x.reshape(nb * r, cin)
    taps = [w[i, 0, 0] for i in range(k)]  # k × (Cin, Cout)

    def shifted_spec(off):
        return pl.BlockSpec(
            (r, cin), lambda p, off=off: (jnp.clip(p + off * bpt, 0, nb - 1), 0))

    in_specs = [shifted_spec(i - pad) for i in range(k)]
    in_specs += [pl.BlockSpec((cin, cout), lambda p: (0, 0))] * k
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, t=t, bpt=bpt),
        out_shape=jax.ShapeDtypeStruct((nb * r, cout), x.dtype),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r, cout), lambda p: (p, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # shifted views overlap blocks
        ),
    )(*([xf] * k), *taps)
    return out.reshape(b, t, h, wd, cout)


def _tconv_fwd(x, w):
    return _tconv(x, w), (x, w)


def _tconv_bwd(res, g):
    x, w = res
    k = w.shape[0]
    _, vjp = jax.vjp(lambda x_, w_: _conv_reference(x_, w_, (k - 1) // 2), x, w)
    return vjp(g)


_tconv.defvjp(_tconv_fwd, _tconv_bwd)


def temporal_conv_fits(x_shape: Tuple[int, ...],
                       kernel_size: Tuple[int, int, int]) -> bool:
    """(k,1,1) kernels only; H·W a multiple of the row block; channels that
    keep the K weight taps + accumulator within VMEM."""
    if kernel_size[1:] != (1, 1):
        return False
    b, t, h, w, cin = x_shape
    hw = h * w
    r = _row_block(cin, hw)
    if hw % r or cin % 128 or cin > 1024:
        return False
    return hw >= 256 and t >= kernel_size[0]


def temporal_conv(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Temporal conv: x (B,T,H,W,Cin), w (k,1,1,Cin,Cout) [DHWIO], SAME-T.

    Dispatches to the Pallas shifted-block kernel on TPU when the geometry
    fits, else XLA's native conv."""
    k = w.shape[0]
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and temporal_conv_fits(x.shape, (k, w.shape[1], w.shape[2])))
    if use_pallas:
        out = _tconv(x, w)
    else:
        out = _conv_reference(x, w, (k - 1) // 2)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
