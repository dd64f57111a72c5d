"""Temporal-chunk sharding: the shard_map'ped window plan must reproduce the
serial reference plan exactly (same starts, same 0.5/0.5 sequential blending)
on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from upscale_a_video_tpu.parallel.temporal import (
    reference_windowed_apply,
    sharded_windowed_apply,
)


def make_window_fn(key, window=8, cin=3, cout=2):
    """Deterministic toy 'model': every output frame mixes all window frames."""
    m = jax.random.normal(key, (window, window))
    w = jax.random.normal(jax.random.PRNGKey(1), (cin, cout))

    def fn(x):  # (B, window, H, W, C)
        mixed = jnp.einsum("kj,bjhwc->bkhwc", m, x)
        return jnp.einsum("bkhwc,cd->bkhwd", mixed, w)

    return fn


@pytest.mark.parametrize("n_dev,t_local", [(2, 12), (4, 12), (8, 12), (2, 24)])
@pytest.mark.slow
def test_sharded_matches_serial(n_dev, t_local):
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devices), ("time",))
    t = n_dev * t_local
    fn = make_window_fn(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, t, 4, 4, 3))

    want = reference_windowed_apply(fn, x)
    g = sharded_windowed_apply(fn, mesh, "time")
    x_sharded = jax.device_put(x, NamedSharding(mesh, P(None, "time")))
    got = g(x_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_single_chunk_degenerates():
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("time",))
    fn = make_window_fn(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 12, 4, 4, 3))
    want = reference_windowed_apply(fn, x)
    got = sharded_windowed_apply(fn, mesh, "time")(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
