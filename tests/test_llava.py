"""JAX LLaVA captioner on tiny configs: vision tower shapes, decoder KV-cache
consistency (prefill+decode == full forward), multimodal splice, sampling."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.models.llava.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionTower,
)
from upscale_a_video_tpu.models.llava.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    causal_prefill_mask,
)
from upscale_a_video_tpu.models.llava.llava import (
    LlavaConfig,
    LlavaModel,
    sample_top_p,
)

TINY_VISION = CLIPVisionConfig(
    hidden_size=16, intermediate_size=32, num_hidden_layers=3,
    num_attention_heads=2, image_size=28, patch_size=14,
)
TINY_TEXT = LlamaConfig(
    vocab_size=64, hidden_size=16, intermediate_size=32,
    num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=64,
)


class TestVisionTower:
    def test_patch_features(self):
        model = CLIPVisionTower(TINY_VISION, feature_layer=-2)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 28, 28, 3))
        params = model.init(jax.random.PRNGKey(1), x)
        out = model.apply(params, x)
        assert out.shape == (1, 4, 16)  # 2x2 patches, CLS dropped
        assert np.isfinite(np.asarray(out)).all()


class TestLlamaKVCache:
    @pytest.mark.slow
    def test_incremental_matches_full(self):
        cfg = TINY_TEXT
        model = LlamaForCausalLM(cfg)
        s, max_len = 5, 8
        emb_dim = cfg.hidden_size
        embeds = jax.random.normal(jax.random.PRNGKey(2), (1, s, emb_dim))
        d = cfg.hidden_size // cfg.num_attention_heads
        kv0 = jnp.zeros((cfg.num_hidden_layers, 2, 1, cfg.kv_heads, max_len, d))
        params = model.init(jax.random.PRNGKey(3), embeds, jnp.arange(s), kv0, 0,
                            causal_prefill_mask(s, max_len))

        # full pass over s tokens
        full_logits, _ = model.apply(params, embeds, jnp.arange(s), kv0, 0,
                                     causal_prefill_mask(s, max_len))

        # prefill first 3, then decode tokens 3, 4 one at a time
        pre = 3
        logits_pre, kv = model.apply(params, embeds[:, :pre], jnp.arange(pre),
                                     kv0, 0, causal_prefill_mask(pre, max_len))
        outs = [logits_pre]
        for i in range(pre, s):
            mask = jnp.where(jnp.arange(max_len)[None, :] <= i, 0.0, -1e9)[None, None]
            li, kv = model.apply(params, embeds[:, i:i + 1], jnp.asarray([i]),
                                 kv, i, mask)
            outs.append(li)
        inc_last = outs[-1][:, -1]
        np.testing.assert_allclose(np.asarray(inc_last),
                                   np.asarray(full_logits[:, -1]), atol=2e-4)


class TestLlavaModel:
    def test_splice_and_prefill(self):
        cfg = LlavaConfig(vision=TINY_VISION, text=TINY_TEXT)
        model = LlavaModel(cfg)
        pixels = jax.random.normal(jax.random.PRNGKey(4), (1, 28, 28, 3))
        ids = jnp.asarray([[1, 5, 0, 9, 3]], dtype=jnp.int32)

        params = model.init(jax.random.PRNGKey(5), pixels,
                            method=model.encode_image)
        # init remaining params by calling splice+prefill in one init pass
        def full(mdl, pixels, ids):
            img = mdl.encode_image(pixels)
            emb = mdl.splice(ids, img, 2)
            return mdl.prefill(emb, 16)

        params = model.init(jax.random.PRNGKey(5), pixels, ids, method=full)
        img = model.apply(params, pixels, method=model.encode_image)
        assert img.shape == (1, 4, 16)
        emb = model.apply(params, ids, img, 2, method=model.splice)
        # 5 text tokens - 1 placeholder + 4 patches = 8
        assert emb.shape == (1, 8, 16)
        logits, kv = model.apply(params, emb, 16, method=model.prefill)
        assert logits.shape == (1, 64)
        tok = jnp.asarray([7], dtype=jnp.int32)
        logits2, kv2 = model.apply(params, tok, kv, 8, method=model.decode_one)
        assert logits2.shape == (1, 64)
        assert np.isfinite(np.asarray(logits2)).all()


class TestSampling:
    def test_greedy_limit(self):
        logits = jnp.asarray([[0.0, 10.0, -5.0]])
        tok = sample_top_p(jax.random.PRNGKey(0), logits, temperature=0.01,
                           top_p=0.5)
        assert int(tok[0]) == 1

    def test_top_p_restricts_support(self):
        # one dominant + many tiny: top_p=0.5 keeps only the top token
        logits = jnp.asarray([[5.0] + [0.0] * 9])
        toks = [int(sample_top_p(jax.random.PRNGKey(i), logits, 1.0, 0.5)[0])
                for i in range(20)]
        assert set(toks) == {0}
