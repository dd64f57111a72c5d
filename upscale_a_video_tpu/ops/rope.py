"""Rotary position embedding (interleaved / GPT-J style).

Matches the semantics of ``rotary_embedding_torch.RotaryEmbedding(dim)`` as
used for temporal attention in the reference (unet_video.py:203,
attention.py:709-711): positions index the *frame* axis, rotation is applied
to the first ``rot_dim`` channels of each head (rot_dim = dim argument, 32 in
the released config; head dims are 32/64/64/128 per level so higher levels are
only partially rotated), remaining channels pass through unchanged. Frequency
layout is interleaved: channel pairs (2i, 2i+1) share frequency
theta^(-2i/dim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotary_frequencies(rot_dim: int, theta: float = 10000.0) -> jax.Array:
    """(rot_dim//2,) inverse frequencies, matching rotary_embedding_torch defaults."""
    return 1.0 / (theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))


def apply_rotary(t: jax.Array, rot_dim: int, theta: float = 10000.0, seq_axis: int = -2) -> jax.Array:
    """Rotate the first ``rot_dim`` channels of ``t`` by position along ``seq_axis``.

    t: (..., seq, d) with d >= rot_dim. Returns same shape/dtype.
    """
    d = t.shape[-1]
    assert d >= rot_dim, f"head dim {d} < rot_dim {rot_dim}"
    seq_axis = seq_axis if seq_axis < 0 else seq_axis - t.ndim
    assert seq_axis in (-2, -3), "positions along axis -2 (…,S,D) or -3 (…,S,H,D)"
    seq = t.shape[seq_axis]

    freqs = rotary_frequencies(rot_dim, theta)  # (rot_dim//2,)
    pos = jnp.arange(seq, dtype=jnp.float32)
    angles = pos[:, None] * freqs[None, :]  # (seq, rot_dim//2)
    # interleaved repeat: (f0, f0, f1, f1, ...)
    angles = jnp.repeat(angles, 2, axis=-1)  # (seq, rot_dim)
    if seq_axis == -3:  # broadcast over the heads axis between seq and dim
        angles = angles[:, None, :]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)

    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    # rotate_half, interleaved: (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)
    x = t_rot.reshape(*t_rot.shape[:-1], rot_dim // 2, 2)
    x1 = x[..., 0]
    x2 = x[..., 1]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(t_rot.shape)

    out_dtype = t.dtype
    t_rot32 = t_rot.astype(jnp.float32)
    rotated32 = rotated.astype(jnp.float32)
    out = t_rot32 * cos + rotated32 * sin
    return jnp.concatenate([out.astype(out_dtype), t_pass], axis=-1)
