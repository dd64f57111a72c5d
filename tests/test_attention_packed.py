"""Packed small-sequence attention (temporal T=8 path): exactness vs the
plain XLA core, including per-head rel-pos bias, batch padding, and grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.ops.attention import (
    attention,
    attention_packed_small,
    attention_xla,
)


def _mk(b, h, s, d, bias_shape=None, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    bias = (jax.random.normal(ks[3], bias_shape, jnp.float32)
            if bias_shape else None)
    return q, k, v, bias


@pytest.mark.parametrize("b,s", [(256, 8), (250, 8), (300, 7), (64, 16)])
def test_packed_matches_xla(b, s):
    q, k, v, bias = _mk(b, 4, s, 64, bias_shape=(1, 4, s, s))
    want = attention_xla(q, k, v, 0.125, bias)
    got = attention_packed_small(q, k, v, 0.125, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_packed_no_bias():
    q, k, v, _ = _mk(512, 8, 8, 64)
    want = attention_xla(q, k, v, 0.125)
    got = attention_packed_small(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_packed_grads_match():
    q, k, v, bias = _mk(128, 8, 8, 32, bias_shape=(1, 8, 8, 8), seed=3)
    cot = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, 0.177, bias) * cot)

    g1 = jax.grad(lambda *a: loss(attention_packed_small, *a),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: loss(attention_xla, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_dispatcher_routes_packed():
    q, k, v, bias = _mk(256, 4, 8, 64, bias_shape=(1, 4, 8, 8), seed=5)
    via_dispatch = attention(q, k, v, 0.125, bias, use_packed=True)
    direct = attention_packed_small(q, k, v, 0.125, bias)
    np.testing.assert_allclose(np.asarray(via_dispatch), np.asarray(direct),
                               atol=0, rtol=0)
    # geometry that must NOT pack: long seq
    q2, k2, v2, _ = _mk(4, 4, 64, 64, seed=6)
    want = attention_xla(q2, k2, v2, 0.125)
    got = attention(q2, k2, v2, 0.125, use_packed=True, use_flash=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
