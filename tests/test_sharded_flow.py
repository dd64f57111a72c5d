"""Sharded RAFT flow (parallel/flow.py) vs the serial clip-sliced
``compute_bidirectional_flows`` (ref raft_bi.py:71-104 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from upscale_a_video_tpu.models.raft import (
    RAFT,
    RaftRunner,
    compute_bidirectional_flows,
)
from upscale_a_video_tpu.parallel.flow import build_sharded_flows


@pytest.fixture(scope="module")
def runner():
    model = RAFT(small=True)
    dummy = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), dummy, dummy, 1)
    return RaftRunner(model=model, params=params, iters=3)


@pytest.mark.parametrize("n_dev,t", [(4, 9), (8, 5), (2, 3)])
def test_matches_serial(runner, n_dev, t):
    """Pair counts that do and don't divide the device count (padding path)."""
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("win",))
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, t, 32, 32, 3),
                                minval=-1, maxval=1)
    want_f, want_b = compute_bidirectional_flows(runner, frames)
    got_f, got_b = build_sharded_flows(runner, mesh)(frames)
    assert got_f.shape == want_f.shape == (1, t - 1, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               atol=1e-4, rtol=1e-4)


def test_non_divisible_resolution(runner):
    """/8 padding path (ref raft_bi.py:47-52 trilinear resize) still matches."""
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("win",))
    frames = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 28, 36, 3),
                                minval=-1, maxval=1)
    want_f, want_b = compute_bidirectional_flows(runner, frames)
    got_f, got_b = build_sharded_flows(runner, mesh)(frames)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               atol=1e-4, rtol=1e-4)
