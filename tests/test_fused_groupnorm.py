"""Fused GroupNorm(+SiLU) kernel vs flax GroupNorm reference (interpret mode
on CPU; compiled on TPU via bench/profiling)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from upscale_a_video_tpu.ops.fused_groupnorm import fused_group_norm


def flax_gn_silu(x, scale, bias, groups, eps=1e-6, act=True):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    return jax.nn.silu(y) if act else y


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 128), 32),
    ((1, 4, 4, 256), 32),
    ((1, 37, 128), 4),       # odd row count → padding path
])
def test_matches_flax_interpret(shape, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    c = shape[-1]
    scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    want = flax_gn_silu(x, scale, bias, groups)
    with pltpu.force_tpu_interpret_mode():
        got = fused_group_norm(x, scale, bias, groups, act="silu",
                               use_pallas=True, block_rows=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_no_act():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    want = flax_gn_silu(x, scale, bias, 32, act=False)
    with pltpu.force_tpu_interpret_mode():
        got = fused_group_norm(x, scale, bias, 32, act=None, use_pallas=True,
                               block_rows=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_jnp_fallback_matches():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 3, 5, 7, 64).astype(np.float32))  # 5-D video
    scale = jnp.asarray(rng.rand(64).astype(np.float32))
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    want = flax_gn_silu(x, scale, bias, 8)
    got = fused_group_norm(x, scale, bias, 8, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
