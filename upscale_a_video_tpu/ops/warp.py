"""Grid sampling / flow warping (the reference's ``F.grid_sample``, component
N5 of SURVEY §2.11).

Used by flow-guided latent propagation (propagation_module.py:104-135,
align_corners=True), RAFT's correlation lookup (RAFT/utils/utils.py:57-72,
align_corners=True), and the optional DCN warp module. Implemented as masked
gathers in pure XLA — gathers vectorize on the VPU; the sampled tensors here
are small (4-ch latents / correlation slices), so HBM bandwidth, not compute,
bounds this op and a custom kernel buys little.

Semantics match torch exactly: ``zeros`` padding (out-of-range taps contribute
0), bilinear or nearest interpolation, both align_corners conventions, grid
last-axis order (x, y) normalized to [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(
    x: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """Channels-last grid sample.

    x: (B, H, W, C); grid: (B, Hg, Wg, 2) with (x, y) in [-1, 1].
    Returns (B, Hg, Wg, C).
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    b, h, w, c = x.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    def gather(ix, iy):
        """Gather x[b, iy, ix, :] with zero padding for out-of-range indices."""
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        flat = x.reshape(b, h * w, c)
        idx = (iyc * w + ixc).astype(jnp.int32)  # (B, Hg, Wg)
        out = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1)
        out = out.reshape(b, *idx.shape[1:], c)
        if padding_mode == "zeros":
            out = out * valid[..., None].astype(out.dtype)
        return out

    if mode == "nearest":
        # torch uses std::nearbyint → round-half-to-even, same as jnp.round
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        return gather(ix, iy)

    assert mode == "bilinear", mode
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = gx - x0
    wx0 = 1.0 - wx1
    wy1 = gy - y0
    wy0 = 1.0 - wy1

    x0i = x0.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)

    out = (
        gather(x0i, y0i) * (wx0 * wy0)[..., None]
        + gather(x1i, y0i) * (wx1 * wy0)[..., None]
        + gather(x0i, y1i) * (wx0 * wy1)[..., None]
        + gather(x1i, y1i) * (wx1 * wy1)[..., None]
    )
    return out.astype(x.dtype)


def flow_warp(
    x: jax.Array,
    flow: jax.Array,
    interpolation: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> jax.Array:
    """Warp ``x`` by per-pixel optical flow (ref propagation_module.py:104-135).

    x: (B, H, W, C); flow: (B, H, W, 2) pixel offsets (x, y).
    Output pixel (i, j) samples x at (j + flow_x, i + flow_y).
    """
    b, h, w, _ = x.shape
    assert flow.shape[1:3] == (h, w), f"flow spatial {flow.shape} != input {x.shape}"
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    gx = xx + flow[..., 0].astype(jnp.float32)
    gy = yy + flow[..., 1].astype(jnp.float32)
    # normalize to [-1, 1] with align_corners=True convention (ref :128-130)
    gxn = 2.0 * gx / max(w - 1, 1) - 1.0
    gyn = 2.0 * gy / max(h - 1, 1) - 1.0
    grid = jnp.stack([gxn, gyn], axis=-1)
    return grid_sample(x, grid, mode=interpolation, padding_mode=padding_mode,
                       align_corners=align_corners)
