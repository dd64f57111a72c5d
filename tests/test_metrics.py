"""PSNR/SSIM sanity + cross-checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.utils.metrics import lpips, psnr, ssim


def test_psnr_identical_is_large():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32))
    assert float(psnr(x, x).min()) > 100


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 1))
    b = jnp.full((1, 8, 8, 1), 0.2)
    # mse = 0.04, range 2 → 10*log10(4/0.04) = 20 dB
    np.testing.assert_allclose(float(psnr(a, b)[0]), 20.0, atol=1e-4)


def test_ssim_identical_is_one():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
    np.testing.assert_allclose(float(ssim(x, x)[0]), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    y = x + jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32)) * 0.3
    s_noisy = float(ssim(x, y)[0])
    assert s_noisy < 0.95
    z = x + jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32)) * 0.6
    assert float(ssim(x, z)[0]) < s_noisy


def test_lpips_requires_features():
    x = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(ValueError):
        lpips(x, x)


def test_lpips_with_dummy_features():
    def feats(x):
        return [x, x[:, ::2, ::2]]

    x = jnp.asarray(np.random.RandomState(3).rand(1, 8, 8, 3).astype(np.float32))
    d = lpips(x, x, feats)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
