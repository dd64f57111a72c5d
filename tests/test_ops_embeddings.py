"""Unit tests for sinusoidal embeddings, RoPE, and T5 relative-position buckets.

RoPE and bucketing are verified against independent torch reimplementations of
the published formulas (rotary_embedding_torch / T5), since those libraries are
not installed here.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from upscale_a_video_tpu.ops import (
    apply_rotary,
    get_timestep_embedding,
    relative_position_buckets,
)


class TestTimestepEmbedding:
    def test_shape_and_range(self):
        emb = get_timestep_embedding(jnp.array([0, 10, 999]), 256)
        assert emb.shape == (3, 256)
        assert float(jnp.max(jnp.abs(emb))) <= 1.0 + 1e-6

    def test_matches_manual_formula(self):
        # diffusers get_timestep_embedding with flip_sin_to_cos=True, shift=0
        dim, t = 64, 37.0
        half = dim // 2
        freqs = np.exp(-math.log(10000) * np.arange(half) / half)
        ang = t * freqs
        expected = np.concatenate([np.cos(ang), np.sin(ang)])  # flipped: cos first
        got = np.asarray(get_timestep_embedding(jnp.array([t]), dim))[0]
        # fp32 frequency table (as in diffusers) vs this fp64 reference
        np.testing.assert_allclose(got, expected, atol=3e-4)

    def test_t0_embedding(self):
        emb = np.asarray(get_timestep_embedding(jnp.array([0]), 8))[0]
        # sin(0)=0, cos(0)=1, flipped → [1,1,1,1,0,0,0,0]
        np.testing.assert_allclose(emb, [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6)


def torch_rotary_reference(t: torch.Tensor, rot_dim: int, theta: float = 10000.0) -> torch.Tensor:
    """Independent reimplementation of rotary_embedding_torch.rotate_queries_or_keys
    (interleaved pairs, positions along axis -2, first rot_dim channels)."""
    *_, seq, d = t.shape
    freqs = 1.0 / (theta ** (torch.arange(0, rot_dim, 2).float() / rot_dim))
    pos = torch.arange(seq).float()
    ang = torch.einsum("i,j->ij", pos, freqs)  # (seq, rot_dim//2)
    ang = ang.repeat_interleave(2, dim=-1)  # (seq, rot_dim)
    cos, sin = ang.cos(), ang.sin()
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    x = t_rot.reshape(*t_rot.shape[:-1], rot_dim // 2, 2)
    x1, x2 = x.unbind(-1)
    rotated = torch.stack((-x2, x1), dim=-1).reshape(t_rot.shape)
    out = t_rot * cos + rotated * sin
    return torch.cat([out, t_pass], dim=-1)


class TestRope:
    def test_matches_torch_reference_full_rotation(self):
        x = np.random.RandomState(0).randn(2, 4, 8, 32).astype(np.float32)
        got = np.asarray(apply_rotary(jnp.asarray(x), rot_dim=32))
        want = torch_rotary_reference(torch.from_numpy(x), 32).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matches_torch_reference_partial_rotation(self):
        # head dim 64, only first 32 rotated (UNet levels 1-3)
        x = np.random.RandomState(1).randn(3, 8, 64).astype(np.float32)
        got = np.asarray(apply_rotary(jnp.asarray(x), rot_dim=32))
        want = torch_rotary_reference(torch.from_numpy(x), 32).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)
        # untouched channels pass through
        np.testing.assert_array_equal(got[..., 32:], x[..., 32:])

    def test_position_zero_identity(self):
        x = np.random.RandomState(2).randn(1, 8, 32).astype(np.float32)
        got = np.asarray(apply_rotary(jnp.asarray(x), rot_dim=32))
        np.testing.assert_allclose(got[:, 0], x[:, 0], atol=1e-6)

    def test_norm_preserved(self):
        x = np.random.RandomState(3).randn(1, 8, 32).astype(np.float32)
        got = np.asarray(apply_rotary(jnp.asarray(x), rot_dim=32))
        np.testing.assert_allclose(
            np.linalg.norm(got, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
        )


def torch_t5_bucket(relative_position: torch.Tensor, num_buckets=32, max_distance=128):
    """Independent reimplementation of the T5 bucket formula used by the
    reference RelativePositionBias (attention.py:747-765)."""
    ret = 0
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).long() * num_buckets
    n = torch.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        torch.log(n.float() / max_exact) / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).long()
    val_if_large = torch.min(val_if_large, torch.full_like(val_if_large, num_buckets - 1))
    ret += torch.where(is_small, n, val_if_large)
    return ret


class TestRelPosBuckets:
    def test_matches_torch_formula(self):
        for n in [2, 8, 16, 32]:
            q = torch.arange(n)
            rel = q[None, :] - q[:, None]
            want = torch_t5_bucket(rel, num_buckets=32, max_distance=32).numpy()
            got = relative_position_buckets(n, num_buckets=32, max_distance=32)
            np.testing.assert_array_equal(got, want)

    def test_diag_zero_bucket(self):
        b = relative_position_buckets(8)
        assert (np.diag(b) == 0).all()

    def test_range(self):
        b = relative_position_buckets(64, num_buckets=32, max_distance=32)
        assert b.min() >= 0 and b.max() < 32
