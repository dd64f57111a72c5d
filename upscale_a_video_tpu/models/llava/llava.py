"""LLaVA multimodal captioner (ref llava/ vendored tree, SURVEY §2.9).

Combines the CLIP vision tower (clip_vision.py), a 2-layer GELU projector
(ref llava/model/multimodal_projector/builder.py:33 ``mlp2x_gelu``), and the
LLaMA decoder (llama.py). The multimodal splice follows
``prepare_inputs_labels_for_multimodal`` (ref llava/model/llava_arch.py:95):
text-token embeddings with the image-patch features inserted at the <image>
placeholder position.

Generation is a jitted two-phase program: one prefill pass over the spliced
embedding sequence, then a ``lax.scan`` of single-token decode steps against a
preallocated KV cache, sampling with temperature 0.2 / top-p 0.7 for ≤64 new
tokens (ref llava/llava_agent.py:81-102). The conversation template
(vicuna_v1) and tokenizer run host-side (conversation.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .clip_vision import CLIPVisionConfig, CLIPVisionTower
from .llama import (
    LlamaConfig,
    LlamaForCausalLM,
    causal_prefill_mask,
    decode_step_mask,
)
from .mpt import MPTConfig, MPTForCausalLM


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    vision: CLIPVisionConfig = CLIPVisionConfig()
    text: LlamaConfig = LlamaConfig()
    # when set, the language model is MPT instead of LLaMA (ref
    # llava/model/language_model/llava_mpt.py ``LlavaMPTForCausalLM``)
    text_mpt: Optional[MPTConfig] = None
    projector_hidden: Optional[int] = None  # defaults to text hidden size

    @property
    def lm_hidden(self) -> int:
        return self.text_mpt.d_model if self.text_mpt else self.text.hidden_size

    @property
    def lm_dims(self):
        """(n_layers, kv_heads, head_dim) for KV-cache allocation."""
        if self.text_mpt:
            c = self.text_mpt
            return c.n_layers, (1 if c.multiquery else c.n_heads), c.head_dim
        c = self.text
        return (c.num_hidden_layers, c.kv_heads,
                c.hidden_size // c.num_attention_heads)


class LlavaModel(nn.Module):
    config: LlavaConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        self.vision_tower = CLIPVisionTower(cfg.vision, dtype=self.dtype)
        ph = cfg.projector_hidden or cfg.lm_hidden
        self.mm_projector_0 = nn.Dense(ph, dtype=self.dtype)
        self.mm_projector_2 = nn.Dense(cfg.lm_hidden, dtype=self.dtype)
        if cfg.text_mpt is not None:
            self.language_model = MPTForCausalLM(cfg.text_mpt, dtype=self.dtype)
        else:
            self.language_model = LlamaForCausalLM(cfg.text, dtype=self.dtype)

    def encode_image(self, pixels: jax.Array) -> jax.Array:
        """(B, H, W, 3) → (B, n_patches, text_hidden) projected features."""
        feats = self.vision_tower(pixels)
        h = self.mm_projector_0(feats)
        h = jax.nn.gelu(h, approximate=False)
        return self.mm_projector_2(h)

    def splice(self, input_ids: jax.Array, image_embeds: jax.Array,
               image_pos: int) -> jax.Array:
        """Embed tokens and insert image features at ``image_pos`` (static).

        input_ids: (B, S_text); image_embeds: (B, P, C).
        Returns (B, S_text - 1 + P, C) — the <image> placeholder token is
        replaced by the P patch embeddings (ref llava_arch.py:95 splice)."""
        emb = self.language_model.embed(input_ids)
        before = emb[:, :image_pos]
        after = emb[:, image_pos + 1:]
        return jnp.concatenate([before, image_embeds.astype(emb.dtype), after], axis=1)

    def prefill(self, inputs_embeds: jax.Array, max_len: int):
        """Run the full prompt; returns (logits_last, kv_caches)."""
        n_layers, kv_heads, d = self.config.lm_dims
        b, s, _ = inputs_embeds.shape
        kv = jnp.zeros(
            (n_layers, 2, b, kv_heads, max_len, d),
            inputs_embeds.dtype,
        )
        positions = jnp.arange(s)
        mask = causal_prefill_mask(s, max_len)
        logits, kv = self.language_model(inputs_embeds, positions, kv, 0, mask)
        return logits[:, -1], kv

    def decode_one(self, token: jax.Array, kv_caches: jax.Array, index):
        """One decode step at position ``index``. token: (B,) int32."""
        emb = self.language_model.embed(token[:, None])
        mask = decode_step_mask(index, kv_caches.shape[-2])
        positions = jnp.asarray(index).reshape(1)
        logits, kv = self.language_model(emb, positions, kv_caches, index, mask)
        return logits[:, -1], kv


def sample_top_p(key, logits, temperature: float = 0.2, top_p: float = 0.7):
    """Temperature + nucleus sampling (ref llava_agent.py:84-87)."""
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-5)
    probs = jax.nn.softmax(logits, axis=-1)
    sorted_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sorted_idx, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep = cum - sorted_probs < top_p  # keep tokens until mass reaches top_p
    filtered = jnp.where(keep, sorted_probs, 0.0)
    filtered = filtered / jnp.sum(filtered, axis=-1, keepdims=True)
    choice = jax.random.categorical(key, jnp.log(filtered + 1e-12), axis=-1)
    return jnp.take_along_axis(sorted_idx, choice[..., None], axis=-1)[..., 0]


class LlavaCaptioner:
    """Host-facing generate wrapper with a single compiled prefill+scan."""

    def __init__(self, model: LlavaModel, params, tokenizer=None,
                 max_new_tokens: int = 64, temperature: float = 0.2,
                 top_p: float = 0.7, eos_token_id: int = 2,
                 quantized: bool = False):
        self.model = model
        self.params = params
        # int8 weight-only storage (ref --load_8bit_llava / bitsandbytes,
        # llava/model/builder.py:29-38): dequantized inside the jitted
        # generate program so XLA fuses int8→bf16 into each matmul read.
        self.quantized = quantized
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.top_p = top_p
        self.eos_token_id = eos_token_id
        self._generate_cache = {}

    def _build_generate(self, prompt_len: int, n_patches: int):
        model = self.model
        total = prompt_len - 1 + n_patches
        max_len = total + self.max_new_tokens

        def generate(params, input_ids, pixels, image_pos, key):
            if self.quantized:
                from ...utils.quant import dequantize_tree

                params = dequantize_tree(params, model.dtype or jnp.bfloat16)
            img = model.apply(params, pixels, method=model.encode_image)
            emb = model.apply(params, input_ids, img, image_pos,
                              method=model.splice)
            logits, kv = model.apply(params, emb, max_len, method=model.prefill)

            def step(carry, key_i):
                logits, kv, index, done = carry
                if self.temperature > 0:
                    token = sample_top_p(key_i, logits, self.temperature, self.top_p)
                else:
                    token = jnp.argmax(logits, axis=-1)
                token = jnp.where(done, self.eos_token_id, token)
                done = done | (token == self.eos_token_id)
                logits, kv = model.apply(params, token.astype(jnp.int32), kv,
                                         index, method=model.decode_one)
                return (logits, kv, index + 1, done), token

            keys = jax.random.split(key, self.max_new_tokens)
            done0 = jnp.zeros((input_ids.shape[0],), bool)
            (_, _, _, _), tokens = jax.lax.scan(
                step, (logits, kv, jnp.int32(total), done0), keys)
            return tokens.transpose(1, 0)  # (B, max_new)

        return jax.jit(generate, static_argnames=("image_pos",))

    def generate_tokens(self, input_ids: np.ndarray, pixels: np.ndarray,
                        image_pos: int, seed: int = 0) -> np.ndarray:
        key = (input_ids.shape[1], pixels.shape[1] // 14)
        n_patches = (pixels.shape[1] // self.model.config.vision.patch_size) ** 2
        cache_key = (input_ids.shape[1], n_patches)
        if cache_key not in self._generate_cache:
            self._generate_cache[cache_key] = self._build_generate(
                input_ids.shape[1], n_patches)
        out = self._generate_cache[cache_key](
            self.params, jnp.asarray(input_ids), jnp.asarray(pixels), image_pos,
            jax.random.PRNGKey(seed))
        return np.asarray(out)

    def caption(self, image_u8: np.ndarray, seed: int = 0,
                stop_strings: tuple = ("</s>",)) -> str:
        """Full pipeline: preprocess + template + generate + decode.

        ``stop_strings`` mirror the reference's KeywordsStoppingCriteria
        (llava/mm_utils.py:76): decoding also stops when a keyword appears in
        the decoded text."""
        from .conversation import build_caption_prompt, preprocess_image

        assert self.tokenizer is not None, "tokenizer required for caption()"
        pixels = preprocess_image(image_u8, self.model.config.vision.image_size)
        ids, image_pos = build_caption_prompt(self.tokenizer)
        tokens = self.generate_tokens(ids[None], pixels[None], image_pos, seed)
        toks = []
        for t in tokens[0]:
            if int(t) == self.eos_token_id:
                break
            toks.append(int(t))
        text = self.tokenizer.decode(toks, skip_special_tokens=True)
        for kw in stop_strings:
            if kw in text:
                text = text.split(kw)[0]
        return text.strip()
