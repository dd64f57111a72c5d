"""RAFT small=True variant: shape/finiteness."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.models.raft import RAFT


@pytest.mark.slow
def test_small_variant_forward():
    model = RAFT(small=True)
    i1 = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3), minval=-1, maxval=1)
    i2 = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3), minval=-1, maxval=1)
    params = model.init(jax.random.PRNGKey(2), i1, i2, 2)
    flow = model.apply(params, i1, i2, 2)
    assert flow.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_small_config_dims():
    m = RAFT(small=True)
    assert m._hdim == 96 and m._cdim == 64 and m._radius == 3
    m = RAFT()
    assert m._hdim == 128 and m._cdim == 128 and m._radius == 4
