"""TPU-only kernel validation (skipped on the CPU test backend; run manually
on hardware: JAX_PLATFORMS= python -m pytest tests/test_tpu_kernels.py -q -m ''
or via scripts — conftest forces CPU for the main suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="requires TPU"
)


def test_flash_attention_compiled():
    from upscale_a_video_tpu.ops.attention import attention_xla
    from upscale_a_video_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 1024, 128), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 1024, 128), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 1024, 128), jnp.bfloat16)
    want = attention_xla(q, k, v, 0.088)
    got = flash_attention(q, k, v, 0.088)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=3e-2)


def test_flash_attention_wide_head():
    from upscale_a_video_tpu.ops.attention import attention_xla
    from upscale_a_video_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(3), (1, 640, 512), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(4), (1, 640, 512), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(5), (1, 640, 512), jnp.bfloat16)
    want = attention_xla(q, k, v, 512**-0.5)
    got = flash_attention(q, k, v, 512**-0.5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=3e-2)


def test_fused_groupnorm_compiled():
    import flax.linen as nn

    from upscale_a_video_tpu.ops.fused_groupnorm import fused_group_norm

    x = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 64, 256), jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    got = fused_group_norm(x, scale, bias, 32, act="silu", use_pallas=True)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    want = jax.nn.silu(gn.apply({"params": {"scale": scale, "bias": bias}}, x))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=3e-2)
