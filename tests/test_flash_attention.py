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
    # text cross: kv=77 → no
    assert not flash_attention_fits(jnp.zeros((16, 8, 1600, 128)),
                                    jnp.zeros((16, 8, 77, 128)),
                                    jnp.zeros((16, 8, 77, 128)), None)
