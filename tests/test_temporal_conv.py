"""Pallas temporal (k,1,1) conv: interpret-mode exactness vs XLA's conv,
boundary masking, Cin≠Cout, grads, fits gate, and module param structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from upscale_a_video_tpu.ops.temporal_conv import (
    _conv_reference,
    temporal_conv,
    temporal_conv_fits,
)


@pytest.mark.parametrize("k,cin,cout,t,hw", [
    (5, 128, 128, 8, 16), (3, 128, 256, 8, 16), (5, 256, 128, 4, 32),
    (3, 128, 128, 3, 16),
])
def test_matches_xla_conv(k, cin, cout, t, hw):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, t, hw, hw, cin))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, 1, 1, cin, cout)) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (cout,))
    want = _conv_reference(x, w, (k - 1) // 2) + bias
    with pltpu.force_tpu_interpret_mode():
        got = temporal_conv(x, w, bias, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_grads_match():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 16, 128))
    w = jax.random.normal(jax.random.PRNGKey(4), (3, 1, 1, 128, 128)) * 0.05
    cot = jax.random.normal(jax.random.PRNGKey(5), x.shape)

    def loss(fn, x, w):
        return jnp.sum(fn(x, w) * cot)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda *a: loss(
            lambda x_, w_: temporal_conv(x_, w_, use_pallas=True), *a),
            argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda *a: loss(
        lambda x_, w_: _conv_reference(x_, w_, 1), *a), argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fits_gate():
    assert temporal_conv_fits((2, 8, 256, 256, 256), (5, 1, 1))
    assert not temporal_conv_fits((2, 8, 256, 256, 256), (3, 3, 3))
    assert not temporal_conv_fits((2, 8, 8, 8, 256), (3, 1, 1))      # tiny HW
    assert not temporal_conv_fits((2, 8, 256, 256, 72), (3, 1, 1))   # C%128
    assert not temporal_conv_fits((2, 2, 256, 256, 256), (5, 1, 1))  # T < k


def test_module_params_unchanged():
    """TemporalConv keeps the nn.Conv param structure (conv/kernel, conv/bias)
    regardless of the dispatch path."""
    from upscale_a_video_tpu.nn.blocks import TemporalConv

    m = TemporalConv(32, (3, 1, 1))
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8, 16)))
    assert set(p["params"].keys()) == {"conv"}
    assert p["params"]["conv"]["kernel"].shape == (3, 1, 1, 16, 32)
    assert p["params"]["conv"]["bias"].shape == (32,)
