"""Textual inversion: checkpoint parsing, tokenizer extension, embedding
table growth, end-to-end conditioning through the pipeline's text encoder
(ref: TextualInversionLoaderMixin on the pipeline,
pipeline_upscale_a_video.py:61)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pipeline import DummyTokenizer
from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from upscale_a_video_tpu.pipeline.pipeline import PipelineModules, VideoUpscalePipeline
from upscale_a_video_tpu.sampling import DDIMScheduler, DDIMSchedulerConfig, DDPMScheduler
from upscale_a_video_tpu.utils.textual_inversion import (
    TextualInversionTokenizer,
    load_textual_inversion,
    parse_textual_inversion,
)

DIM = 16


class FakeHFTok:
    """Minimal HF-CLIPTokenizer-like object (add_tokens / convert ids)."""

    def __init__(self, vocab=64):
        self.vocab = vocab
        self.added = {}
        self.model_max_length = 8

    def add_tokens(self, toks):
        for t in toks:
            self.added.setdefault(t, self.vocab + len(self.added))

    def convert_tokens_to_ids(self, t):
        return self.added[t]


class FakeAdapter:
    """Mimics loader.HFTokenizerAdapter: has .tok, encodes word-wise."""

    def __init__(self):
        self.tok = FakeHFTok()

    def __call__(self, prompts):
        out = np.full((len(prompts), 8), 63, np.int32)
        for i, p in enumerate(prompts):
            ids = [62]
            for w in p.split():
                ids.append(self.tok.added.get(w, min(hash(w) % 60, 59)))
            out[i, : min(8, len(ids))] = ids[:8]
        return out


def _pipeline(tokenizer):
    cfg = UNetVideoConfig(block_out_channels=(8, 16, 16, 32),
                          attention_head_dim=4, norm_num_groups=4,
                          cross_attention_dim=DIM)
    unet = UNetVideoModel(cfg)
    vae = AutoencoderKLVideo(VaeConfig(block_out_channels=(8, 16, 16),
                                       norm_num_groups=4))
    clip = CLIPTextModel(CLIPTextConfig(vocab_size=64, hidden_size=DIM,
                                        intermediate_size=32,
                                        num_hidden_layers=2,
                                        num_attention_heads=2,
                                        max_position_embeddings=8))
    modules = PipelineModules(
        unet=unet,
        unet_params=unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), 0,
                              jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 8, DIM)), 0),
        vae=vae, vae_params=vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3))),
        text_encoder=clip,
        text_params=clip.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32)),
        tokenizer=tokenizer,
        scheduler=DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear")),
        low_res_scheduler=DDPMScheduler(),
    )
    return VideoUpscalePipeline(modules, dtype=jnp.float32,
                                decode_dtype=jnp.float32)


def test_parse_schemas():
    vec = np.arange(DIM, dtype=np.float32)
    assert parse_textual_inversion({"<c>": vec})[0][0] == "<c>"
    multi = np.stack([vec, vec + 1])
    a1111 = {"string_to_param": {"*": multi}, "name": "<s>"}
    tok, emb = parse_textual_inversion(a1111)[0]
    assert tok == "<s>" and emb.shape == (2, DIM)


def test_load_extends_embedding_and_conditions():
    pipe = _pipeline(FakeAdapter())
    vec = 0.5 * np.ones(DIM, np.float32)
    names = load_textual_inversion(pipe, {"<cat>": vec})
    assert names == ["<cat>"]

    emb = pipe.m.text_params["params"]["token_embedding"]["embedding"]
    assert emb.shape[0] == 65  # vocab 64 + 1 new row
    np.testing.assert_allclose(np.asarray(emb[64]), vec)

    # encoding a prompt containing the placeholder routes through the new row
    with_tok = pipe.encode_prompt(["a <cat> photo"], None, False)
    without = pipe.encode_prompt(["a photo"], None, False)
    assert not np.allclose(np.asarray(with_tok), np.asarray(without))


def test_multi_vector_expansion():
    pipe = _pipeline(FakeAdapter())
    multi = np.stack([np.ones(DIM), 2 * np.ones(DIM)]).astype(np.float32)
    names = load_textual_inversion(pipe, {"<s>": multi})
    assert names == ["<s>", "<s>_1"]
    tok = pipe.m.tokenizer
    assert tok.expand_prompt("a <s> b") == "a <s> <s>_1 b"
    ids = tok(["a <s> b"])
    emb = pipe.m.text_params["params"]["token_embedding"]["embedding"]
    assert emb.shape[0] == 66
    assert tok.tokens["<s>"] in ids[0] and tok.tokens["<s>_1"] in ids[0]


def test_fallback_tokenizer_rejects_placeholders():
    pipe = _pipeline(DummyTokenizer())
    load_textual_inversion(pipe, {"<c>": np.ones(DIM, np.float32)})
    with pytest.raises(ValueError, match="placeholders require"):
        pipe.m.tokenizer(["a <c> b"])
    # prompts without placeholders still work through the wrapper
    assert pipe.m.tokenizer(["plain prompt"]).shape[1] > 0


def test_dim_mismatch_raises():
    pipe = _pipeline(FakeAdapter())
    with pytest.raises(ValueError, match="dim"):
        load_textual_inversion(pipe, {"<c>": np.ones(DIM + 1, np.float32)})


def test_multi_vector_expansion_with_underscore_placeholder():
    """Placeholders containing '_' (e.g. '<my_style>') must still expand —
    the group map is tracked explicitly, not reverse-engineered from names."""
    pipe = _pipeline(FakeAdapter())
    multi = np.stack([np.ones(DIM), 2 * np.ones(DIM)]).astype(np.float32)
    names = load_textual_inversion(pipe, {"<my_style>": multi})
    assert names == ["<my_style>", "<my_style>_1"]
    tok = pipe.m.tokenizer
    assert tok.expand_prompt("a <my_style> b") == "a <my_style> <my_style>_1 b"


def test_shared_prefix_tokens_do_not_collide():
    """Two registered tokens sharing a 'tok_' prefix with a non-numeric
    suffix must not break expansion (old rsplit parsing raised ValueError)."""
    pipe = _pipeline(FakeAdapter())
    load_textual_inversion(pipe, {"<c>": np.ones(DIM, np.float32)})
    load_textual_inversion(pipe, {"<c>_extra": np.ones(DIM, np.float32)})
    tok = pipe.m.tokenizer
    # longest-first replacement: '<c>_extra' is its own single-vector group
    assert tok.expand_prompt("x <c>_extra y") == "x <c>_extra y"
    assert tok.expand_prompt("x <c> y") == "x <c> y"
