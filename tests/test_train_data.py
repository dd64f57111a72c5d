"""Degradation pipeline + prefetcher tests."""

import jax
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.training.data import (
    add_gaussian_noise,
    degrade_clip,
    gaussian_blur,
    jpeg_like_artifacts,
    make_train_batch,
)
from upscale_a_video_tpu.utils.prefetch import device_prefetch


class TestDegradations:
    def test_blur_preserves_mean(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
        out = gaussian_blur(x, jnp.asarray([1.5]))
        assert out.shape == x.shape
        np.testing.assert_allclose(float(out.mean()), float(x.mean()), atol=0.02)
        # blur reduces variance
        assert float(out.var()) < float(x.var())

    def test_noise_level_scales(self):
        x = jnp.zeros((2, 2, 16, 16, 3))
        out = add_gaussian_noise(jax.random.PRNGKey(1), x,
                                 jnp.asarray([0.01, 0.2]))
        assert float(jnp.abs(out[0]).std()) < float(jnp.abs(out[1]).std())

    def test_jpeg_blocks(self):
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 16, 16, 3))
        out_hard = jpeg_like_artifacts(x, jnp.asarray([0.0]))
        # quality 0 → pure 8x8 block means
        block = np.asarray(out_hard)[0, 0, :8, :8, 0]
        np.testing.assert_allclose(block, block.mean(), atol=1e-5)
        out_none = jpeg_like_artifacts(x, jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(out_none), np.asarray(x), atol=1e-6)

    def test_degrade_shapes_and_range(self):
        hr = jax.random.uniform(jax.random.PRNGKey(3), (2, 3, 64, 64, 3),
                                minval=-1, maxval=1)
        lr = degrade_clip(jax.random.PRNGKey(4), hr)
        assert lr.shape == (2, 3, 16, 16, 3)
        assert float(jnp.abs(lr).max()) <= 1.0 + 1e-6

    def test_make_train_batch(self):
        hr = jax.random.uniform(jax.random.PRNGKey(5), (1, 2, 32, 32, 3),
                                minval=-1, maxval=1)

        def fake_encode(x):
            return x[:, :, ::4, ::4, :1].repeat(4, axis=-1)

        batch = make_train_batch(jax.random.PRNGKey(6), hr, fake_encode,
                                 jnp.zeros((1, 5, 16)), 0.08333)
        assert batch["latents"].shape == (1, 2, 8, 8, 4)
        assert batch["low_res"].shape == (1, 2, 8, 8, 3)


class TestPrefetch:
    def test_order_and_errors(self):
        items = [np.full((2, 2), i, np.float32) for i in range(5)]
        out = list(device_prefetch(iter(items), buffer_size=2))
        assert len(out) == 5
        for i, x in enumerate(out):
            np.testing.assert_allclose(np.asarray(x), i)

    def test_transform_applied(self):
        items = [np.ones((2,), np.float32)] * 3
        out = list(device_prefetch(iter(items), transform=lambda x: x * 2))
        for x in out:
            np.testing.assert_allclose(np.asarray(x), 2.0)

    def test_error_propagates(self):
        def gen():
            yield np.ones((1,), np.float32)
            raise RuntimeError("decode failed")

        it = device_prefetch(gen())
        next(it)
        try:
            next(it)
            raised = False
        except RuntimeError:
            raised = True
        assert raised
