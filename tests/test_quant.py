"""Int8 weight-only quantization (utils/quant.py, SURVEY §2.11 N8).

- per-channel round-trip error bounded by scale/2
- tree quantization scope (skips norms/embeddings/small leaves)
- dequantize-inside-jit matmul parity
- tiny LLaMA: quantized generate stays close to fp32 logits
- captioner path: quantized=True generates tokens end to end
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.utils.quant import (
    QuantizedTensor,
    dequantize,
    dequantize_tree,
    quantize,
    quantize_tree,
    tree_nbytes,
)


class TestQuantize:
    def test_roundtrip_error_bound(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 48))
        q = quantize(w, axis=-1)
        assert q.values.dtype == jnp.int8
        assert q.scale.shape == (1, 48)
        err = np.abs(np.asarray(dequantize(q)) - np.asarray(w))
        bound = np.asarray(q.scale) / 2 + 1e-7
        assert (err <= bound).all()

    def test_per_channel_axis(self):
        # one huge column must not inflate the other columns' error
        w = jnp.ones((32, 4)).at[:, 0].mul(1000.0)
        q = quantize(w, axis=-1)
        back = np.asarray(dequantize(q))
        np.testing.assert_allclose(back[:, 1:], 1.0, atol=0.01)

    def test_zero_channel(self):
        w = jnp.zeros((16, 8))
        back = np.asarray(dequantize(quantize(w)))
        np.testing.assert_array_equal(back, 0.0)

    def test_pytree_registered(self):
        q = quantize(jnp.ones((8, 8)))
        leaves = jax.tree_util.tree_leaves(q)
        assert len(leaves) == 2
        out = jax.jit(lambda t: dequantize(t, jnp.float32))(q)
        assert out.shape == (8, 8)


class TestQuantizeTree:
    def test_scope(self):
        tree = {
            "dense": {"kernel": jnp.ones((256, 128)), "bias": jnp.ones((128,))},
            "embed_tokens": {"embedding": jnp.ones((512, 256))},
            "final_norm": {"scale": jnp.ones((128, 128))},
            "tiny": {"kernel": jnp.ones((4, 4))},
        }
        qt = quantize_tree(tree)
        assert isinstance(qt["dense"]["kernel"], QuantizedTensor)
        assert not isinstance(qt["dense"]["bias"], QuantizedTensor)
        assert not isinstance(qt["embed_tokens"]["embedding"], QuantizedTensor)
        assert not isinstance(qt["final_norm"]["scale"], QuantizedTensor)
        assert not isinstance(qt["tiny"]["kernel"], QuantizedTensor)
        assert tree_nbytes(qt) < tree_nbytes(tree)

    def test_dequantize_tree_dtype(self):
        tree = {"k": jnp.ones((256, 128)), "b": jnp.ones((128,)),
                "step": jnp.array(3, jnp.int32)}
        qt = quantize_tree(tree, should_quantize=lambda p, leaf: leaf.ndim == 2)
        back = dequantize_tree(qt, jnp.bfloat16)
        assert back["k"].dtype == jnp.bfloat16
        assert back["b"].dtype == jnp.bfloat16
        assert back["step"].dtype == jnp.int32  # ints untouched

    def test_matmul_in_jit(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (128, 256)) * 0.02
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 128))
        qt = quantize_tree({"w": w}, should_quantize=lambda p, leaf: True)

        @jax.jit
        def fn(qt, x):
            return x @ dequantize_tree(qt)["w"]

        got = np.asarray(fn(qt, x))
        want = np.asarray(x @ w)
        # error bound: sum of 128 independent per-element errors ≤ scale/2
        scale = float(np.max(np.asarray(quantize(w).scale)))
        bound = 128 * scale / 2
        assert np.max(np.abs(got - want)) < bound
        np.testing.assert_allclose(got, want, atol=8 * np.sqrt(128) * scale)


class TestLlamaQuantized:
    @pytest.mark.slow
    def test_logits_close_and_generate_runs(self):
        from tests.test_llava import TINY_TEXT, TINY_VISION
        from upscale_a_video_tpu.models.llava.llava import (
            LlavaCaptioner,
            LlavaConfig,
            LlavaModel,
        )

        model = LlavaModel(LlavaConfig(vision=TINY_VISION, text=TINY_TEXT))
        pixels = jax.random.normal(jax.random.PRNGKey(3), (1, 28, 28, 3))
        ids = jnp.array([[1, 5, 9, 2, 7]], jnp.int32)

        def full(mdl, pixels, ids):
            img = mdl.encode_image(pixels)
            emb = mdl.splice(ids, img, 1)
            return mdl.prefill(emb, 16)

        params = model.init(jax.random.PRNGKey(4), pixels, ids, method=full)

        # quantize EVERYTHING ≥2-D to maximize exercised coverage on the tiny
        # model (the default size threshold would skip all of it)
        qparams = quantize_tree(
            params, should_quantize=lambda p, leaf: leaf.ndim >= 2
            and "embed" not in p.lower() and "norm" not in p.lower())

        logits_fp, _ = model.apply(params, pixels, ids, method=full)
        logits_q, _ = model.apply(dequantize_tree(qparams, jnp.float32),
                                  pixels, ids, method=full)
        # int8 weight error compounds over layers; demand correlation, not
        # bit-match
        a, b = np.asarray(logits_fp).ravel(), np.asarray(logits_q).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.98, corr

        cap = LlavaCaptioner(model, qparams, max_new_tokens=4, quantized=True)
        toks = cap.generate_tokens(np.asarray(ids), np.asarray(pixels),
                                   image_pos=1)
        assert toks.shape == (1, 4)
        assert np.isfinite(toks).all()
