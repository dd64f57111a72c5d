"""Flash-attention kernel vs the XLA reference path.

On the CPU test backend the Pallas kernel runs in interpret mode; the same
code compiles to Mosaic on TPU (exercised by bench.py / test_tpu_kernels.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from upscale_a_video_tpu.ops.attention import attention_xla
from upscale_a_video_tpu.ops.flash_attention import flash_attention, flash_attention_fits


@pytest.mark.parametrize(
    "bh,sq,sk,d",
    [
        (2, 256, 256, 128),
        (1, 640, 640, 128),   # non-multiple of 256 → padding path
        (1, 512, 512, 512),   # VAE-style single head, wide d
        (4, 384, 128, 128),   # short KV
    ],
)
def test_matches_xla(bh, sq, sk, d):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (bh, sq, d), jnp.float32)
    k = jax.random.normal(keys[1], (bh, sk, d), jnp.float32)
    v = jax.random.normal(keys[2], (bh, sk, d), jnp.float32)
    scale = d**-0.5

    want = attention_xla(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_multihead_layout():
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 256, 128))
    k = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 256, 128))
    v = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 256, 128))
    want = attention_xla(q, k, v, 0.1)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, 0.1)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_fits_gate():
    q = jnp.zeros((1, 8, 1600, 128))
    k = jnp.zeros((1, 8, 1600, 128))
    assert flash_attention_fits(q, k, k, None)
    assert not flash_attention_fits(q, k, k, jnp.zeros((1, 8, 1600, 1600)))
    # temporal attention: seq 8 → no
    assert not flash_attention_fits(jnp.zeros((64, 8, 8, 32)),
                                    jnp.zeros((64, 8, 8, 32)),
                                    jnp.zeros((64, 8, 8, 32)), None)
    # text cross with a moderate query side: kv=77 → not worth tiling
    assert not flash_attention_fits(jnp.zeros((16, 8, 1600, 128)),
                                    jnp.zeros((16, 8, 77, 128)),
                                    jnp.zeros((16, 8, 77, 128)), None)
    # long-query/short-KV stays on XLA (measured faster there — see gate)
    assert not flash_attention_fits(jnp.zeros((16, 8, 16384, 64)),
                                    jnp.zeros((16, 8, 77, 64)),
                                    jnp.zeros((16, 8, 77, 64)), None)


def test_short_kv_and_padded_head_dim():
    """Sk=77 text-cross geometry with d=64 (the UNet shape): wrapper pads the
    lane dim and masks the padded keys; must match XLA exactly."""
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(keys[0], (4, 2048, 64), jnp.float32)
    k = jax.random.normal(keys[1], (4, 77, 64), jnp.float32)
    v = jax.random.normal(keys[2], (4, 77, 64), jnp.float32)
    want = attention_xla(q, k, v, 64**-0.5)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, 64**-0.5)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@pytest.mark.slow
def test_flash_grad_matches_xla():
    """custom_vjp: grads through the flash path equal XLA-attention grads."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from upscale_a_video_tpu.ops.attention import attention_xla

    key = jax.random.PRNGKey(7)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (2, 640, 128), jnp.float32)
    k = jax.random.normal(kk, (2, 640, 128), jnp.float32)
    v = jax.random.normal(kv, (2, 640, 128), jnp.float32)
    cot = jax.random.normal(kg, (2, 640, 128), jnp.float32)
    scale = 0.0883883

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) * cot)

    def loss_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v, scale) * cot)

    with pltpu.force_tpu_interpret_mode():
        gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    wq, wk, wv = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(wq), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), atol=2e-3, rtol=1e-3)
