"""Distributed propagation (parallel/propagation.py): the pipelined
boundary-exchange recurrence must match the serial ``propagate_latents``
bit-for-bit on a time-sharded mesh, at a fraction of the wire volume."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from upscale_a_video_tpu.models.propagation import propagate_latents
from upscale_a_video_tpu.parallel.propagation import (
    comm_bytes_estimate,
    distributed_propagate_latents,
)


def _run_distributed(x, ff, fb, n_dev, **kw):
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("time",))
    fn = shard_map(
        functools.partial(distributed_propagate_latents, axis="time",
                          n_chunks=n_dev, **kw),
        mesh=mesh,
        in_specs=(P(None, "time"), P(), P()),
        out_specs=P(None, "time"),
        check_rep=False,
    )
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "time")))
    return jax.jit(fn)(xs, ff, fb)


@pytest.mark.parametrize("n_dev,t", [(2, 8), (4, 8), (8, 16), (8, 8)])
@pytest.mark.slow
def test_matches_serial_exactly(n_dev, t):
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    b, h, w, c = 1, 8, 8, 4
    x = jax.random.normal(k1, (b, t, h, w, c))
    # pixel-res flows (2× latent res), moderate magnitudes so both the
    # consistent and inconsistent mask branches are exercised
    ff = jax.random.normal(k2, (b, t - 1, 2 * h, 2 * w, 2)) * 3.0
    fb = jax.random.normal(k3, (b, t - 1, 2 * h, 2 * w, 2)) * 3.0

    want = propagate_latents(x, ff, fb)
    got = _run_distributed(x, ff, fb, n_dev)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_matches_serial_bilinear_and_params():
    k = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(k, 3)
    x = jax.random.normal(k1, (2, 8, 6, 6, 4))
    ff = jax.random.normal(k2, (2, 7, 12, 12, 2)) * 2.0
    fb = jax.random.normal(k3, (2, 7, 12, 12, 2)) * 2.0
    kw = dict(interpolation="bilinear", fuse_scale=0.3, alpha1=0.01, alpha2=0.5)
    want = propagate_latents(x, ff, fb, **kw)
    got = _run_distributed(x, ff, fb, 4, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_comm_volume_is_boundary_only():
    est = comm_bytes_estimate((1, 96, 40, 40, 4), n_chunks=8)
    # the boundary plan moves L× less data (L = 12 frames/chip here)
    assert est["boundary_bytes"] * 12 == est["allgather_bytes"] // 8 * 8 \
        or est["boundary_bytes"] < est["allgather_bytes"] / 10
    frame = 1 * 40 * 40 * 4 * 4
    assert est["boundary_bytes"] == 2 * 7 * frame
