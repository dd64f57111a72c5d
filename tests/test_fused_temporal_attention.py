"""Fused temporal-attention kernel: interpret-mode exactness vs the XLA
reference, padding, grads, and layout equivalence with the module's
split-heads path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from upscale_a_video_tpu.ops.attention import attention_xla
from upscale_a_video_tpu.ops.fused_temporal_attention import (
    _reference,
    fused_temporal_attention,
    fused_temporal_attention_fits,
)


def _mk(b, s, h, d, seed=0, bias=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    bs = jax.random.normal(ks[3], (h, s, s), jnp.float32) if bias else None
    return q, k, v, bs


@pytest.mark.parametrize("b,s,h,d", [(512, 8, 8, 64), (520, 8, 4, 64),
                                     (512, 16, 2, 128), (513, 8, 8, 64)])
@pytest.mark.slow
def test_kernel_matches_reference(b, s, h, d):
    q, k, v, bias = _mk(b, s, h, d)
    want = _reference(q, k, v, bias)
    with pltpu.force_tpu_interpret_mode():
        got = fused_temporal_attention(q, k, v, bias, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_kernel_no_bias():
    q, k, v, _ = _mk(512, 8, 8, 64, bias=False)
    want = _reference(q, k, v, None)
    with pltpu.force_tpu_interpret_mode():
        got = fused_temporal_attention(q, k, v, None, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_grads_match_reference():
    q, k, v, bias = _mk(256, 8, 4, 64, seed=3)
    cot = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, bias) * cot)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda *a: loss(
            lambda q_, k_, v_, b_: fused_temporal_attention(
                q_, k_, v_, b_, use_pallas=True), *a),
            argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: loss(_reference, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_layout_equivalence_with_split_heads():
    """(B,S,H,D) reshape layout == the module's split-heads (B,H,S,D) path:
    both must slice the same channels per head."""
    b, s, h, d = 64, 8, 4, 16
    inner = h * d
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    qf = jax.random.normal(ks[0], (b, s, inner), jnp.float32)
    kf = jax.random.normal(ks[1], (b, s, inner), jnp.float32)
    vf = jax.random.normal(ks[2], (b, s, inner), jnp.float32)
    bias = jax.random.normal(ks[3], (h, s, s), jnp.float32)

    # split-heads path
    def split(x):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    a = attention_xla(split(qf), split(kf), split(vf), 1.0, bias[None])
    a = a.transpose(0, 2, 1, 3).reshape(b, s, inner)

    # fused layout path
    o = _reference(qf.reshape(b, s, h, d), kf.reshape(b, s, h, d),
                   vf.reshape(b, s, h, d), bias).reshape(b, s, inner)
    np.testing.assert_allclose(np.asarray(o), np.asarray(a),
                               atol=2e-5, rtol=1e-5)


def test_fits_gate():
    assert fused_temporal_attention_fits(32768, 8, 8, 64)
    assert not fused_temporal_attention_fits(32768, 7, 8, 64)   # 128 % 7 != 0
    assert not fused_temporal_attention_fits(32768, 8, 8, 80)   # d not /64
    assert not fused_temporal_attention_fits(16, 8, 2, 64)      # tiny batch


def test_rope_seq_axis_minus3():
    from upscale_a_video_tpu.ops.rope import apply_rotary

    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 2, 64))
    a = apply_rotary(x, rot_dim=32, seq_axis=-3)
    b = apply_rotary(x.transpose(0, 2, 1, 3), rot_dim=32).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
