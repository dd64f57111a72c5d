"""Optional temporal-transformer variants: shapes + mode semantics vs direct
numpy formulations (temporal_module.py:197-693)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.nn.attention import SparseCausalAttention
from upscale_a_video_tpu.nn.temporal import TemporalModule3D
from upscale_a_video_tpu.nn.temporal_transformer import (
    AdaLayerNorm,
    TemporalTransformer3DModel,
    VersatileSelfAttention,
    WarpModule,
    temporal_shift,
    temporal_token_concat,
)


class TestTokenOps:
    def test_cross_frame_concat_modes(self):
        rng = np.random.RandomState(0)
        f, s, c = 4, 3, 2
        x = rng.randn(1 * f, s, c).astype(np.float32)
        t = x.reshape(1, f, s, c)

        out = np.asarray(temporal_token_concat(jnp.asarray(x), f, "0_i-1"))
        assert out.shape == (f, 2 * s, c)
        # frame 2: [frame0 tokens, frame1 tokens]
        np.testing.assert_array_equal(out.reshape(1, f, 2 * s, c)[0, 2, :s], t[0, 0])
        np.testing.assert_array_equal(out.reshape(1, f, 2 * s, c)[0, 2, s:], t[0, 1])

        out = np.asarray(temporal_token_concat(jnp.asarray(x), f, "i-1_i_i+1"))
        assert out.shape == (f, 3 * s, c)
        got = out.reshape(1, f, 3 * s, c)
        np.testing.assert_array_equal(got[0, 1, :s], t[0, 0])
        np.testing.assert_array_equal(got[0, 1, s:2 * s], t[0, 1])
        np.testing.assert_array_equal(got[0, 1, 2 * s:], t[0, 2])
        # boundary: last frame's i+1 clamps to itself (ref :477)
        np.testing.assert_array_equal(got[0, f - 1, 2 * s:], t[0, f - 1])

    def test_temporal_shift(self):
        rng = np.random.RandomState(1)
        f, s, c = 3, 2, 4
        x = rng.randn(f, s, c).astype(np.float32)
        out = np.asarray(temporal_shift(jnp.asarray(x), f, fold_div=2))
        t = x.reshape(1, f, s, c)
        got = out.reshape(1, f, s, c)
        # first half channels shifted right in time; frame0 zeros
        np.testing.assert_array_equal(got[0, 0, :, :2], np.zeros((s, 2)))
        np.testing.assert_array_equal(got[0, 1, :, :2], t[0, 0, :, :2])
        # second half untouched
        np.testing.assert_array_equal(got[0, :, :, 2:], t[0, :, :, 2:])


class TestModules:
    @pytest.mark.parametrize("mode", ["Temporal", "Spatial", "CrossFrame",
                                      "SpatialTemporalShift"])
    def test_versatile_attention_modes(self, mode):
        model = VersatileSelfAttention(
            query_dim=8, heads=2, dim_head=4, attention_mode=mode,
            cross_frame_attention_mode="0_i-1" if mode == "CrossFrame" else None,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 8))  # (B·F=4, S=6, C=8)
        params = model.init(jax.random.PRNGKey(1), x, 4)
        out = model.apply(params, x, 4)
        assert out.shape == x.shape
        # zero-init output projection → output is exactly zero at init (ref :365,381)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_ada_layer_norm(self):
        model = AdaLayerNorm(8, 1000)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 8))
        params = model.init(jax.random.PRNGKey(3), x, jnp.array([10]))
        a = model.apply(params, x, jnp.array([10]))
        b = model.apply(params, x, jnp.array([500]))
        assert a.shape == x.shape
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_warp_module_flow(self):
        model = WarpModule(in_channels=4, use_deformable_conv=False)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 4))  # 4x4 grid
        off = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 4))
        params = model.init(jax.random.PRNGKey(6), x, off)
        out = model.apply(params, x, off)
        assert out.shape == x.shape

    def test_warp_module_dcn(self):
        model = WarpModule(in_channels=4, use_deformable_conv=True)
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 4))
        off = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 4))
        params = model.init(jax.random.PRNGKey(9), x, off)
        out = model.apply(params, x, off)
        assert out.shape == x.shape
        # alpha zero-init → identity at init (ref :596,623)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    @pytest.mark.slow
    def test_full_temporal_transformer(self):
        model = TemporalTransformer3DModel(
            heads=2, dim_head=4, in_channels=8, norm_num_groups=4,
            attention_block_types=("Spatial", "Temporal"),
        )
        x = jax.random.normal(jax.random.PRNGKey(10), (1, 3, 4, 4, 8))
        params = model.init(jax.random.PRNGKey(11), x, jnp.array([100]))
        out = model.apply(params, x, jnp.array([100]))
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_temporal_module_with_attention(self):
        model = TemporalModule3D(
            in_channels=8, temb_channels=None, groups=4,
            attention_block_types=("", "Temporal"), num_attention_heads=2,
        )
        x = jax.random.normal(jax.random.PRNGKey(12), (1, 3, 4, 4, 8))
        params = model.init(jax.random.PRNGKey(13), x, timesteps=jnp.array([7]))
        out = model.apply(params, x, timesteps=jnp.array([7]))
        assert out.shape == x.shape

    def test_sparse_causal_attention(self):
        model = SparseCausalAttention(query_dim=8, heads=2, dim_head=4)
        x = jax.random.normal(jax.random.PRNGKey(14), (4, 6, 8))
        params = model.init(jax.random.PRNGKey(15), x, 4)
        out = model.apply(params, x, 4)
        assert out.shape == x.shape
