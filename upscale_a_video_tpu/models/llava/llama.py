"""LLaMA/Vicuna decoder in flax with a static KV cache for greedy/sampled
decoding (ref llava/model/language_model/llava_llama.py wraps HF LlamaModel).

Standard LLaMA: RMSNorm, rotary attention (non-interleaved half-rotation, the
HF convention — different from the video UNet's interleaved RoPE), SwiGLU MLP.
Decoding runs as a ``lax.scan`` over token positions with a preallocated
(max_len) KV cache — one compiled program regardless of generated length.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 5120          # 13B
    intermediate_size: int = 13824
    num_hidden_layers: int = 40
    num_attention_heads: int = 40
    num_key_value_heads: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @classmethod
    def from_dict(cls, d: dict) -> "LlamaConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones_init(), (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(x.dtype)


def _rope_half(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """HF-style rotary: rotate_half over contiguous halves.
    x: (B, H, S, D); positions: (S,) or (B, S)."""
    d = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    pos = positions.astype(jnp.float32)
    ang = pos[..., None] * inv  # (..., S, d/2)
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    cos = jnp.concatenate([cos, cos], axis=-1)
    sin = jnp.concatenate([sin, sin], axis=-1)
    while cos.ndim < x.ndim:
        cos = cos[None]
        sin = sin[None]
    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


class LlamaLayer(nn.Module):
    config: LlamaConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, positions, kv_cache, cache_index, mask):
        """x (B, S, C); kv_cache (2, B, Hkv, max_len, D) or None; mask
        (B, 1, S, L) additive. Returns (x, new_kv)."""
        cfg = self.config
        h = cfg.num_attention_heads
        hkv = cfg.kv_heads
        d = cfg.hidden_size // h
        dense = lambda f, name: nn.Dense(f, use_bias=False, dtype=self.dtype, name=name)

        res = x
        y = RMSNorm(cfg.rms_norm_eps, dtype=self.dtype, name="input_layernorm")(x)
        b, s, _ = y.shape
        q = dense(h * d, "self_attn_q_proj")(y).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = dense(hkv * d, "self_attn_k_proj")(y).reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
        v = dense(hkv * d, "self_attn_v_proj")(y).reshape(b, s, hkv, d).transpose(0, 2, 1, 3)

        q = _rope_half(q, positions, cfg.rope_theta)
        k = _rope_half(k, positions, cfg.rope_theta)

        if kv_cache is not None:
            ck, cv = kv_cache[0], kv_cache[1]
            ck = jax.lax.dynamic_update_slice_in_dim(ck, k, cache_index, axis=2)
            cv = jax.lax.dynamic_update_slice_in_dim(cv, v, cache_index, axis=2)
            k_all, v_all = ck, cv
            new_cache = jnp.stack([ck, cv])
        else:
            k_all, v_all = k, v
            new_cache = None

        if hkv != h:
            rep = h // hkv
            k_all = jnp.repeat(k_all, rep, axis=1)
            v_all = jnp.repeat(v_all, rep, axis=1)

        scores = jnp.einsum("bhid,bhjd->bhij", q, k_all,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
        o = jnp.einsum("bhij,bhjd->bhid", probs, v_all)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        x = res + dense(cfg.hidden_size, "self_attn_o_proj")(o)

        res = x
        y = RMSNorm(cfg.rms_norm_eps, dtype=self.dtype,
                    name="post_attention_layernorm")(x)
        gate = dense(cfg.intermediate_size, "mlp_gate_proj")(y)
        up = dense(cfg.intermediate_size, "mlp_up_proj")(y)
        y = dense(cfg.hidden_size, "mlp_down_proj")(jax.nn.silu(gate) * up)
        return res + y, new_cache


class LlamaModel(nn.Module):
    """Decoder over input *embeddings* (LLaVA splices image features into the
    embedding sequence, so the public interface is embedding-level)."""

    config: LlamaConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs_embeds, positions, kv_caches, cache_index, mask):
        cfg = self.config
        x = inputs_embeds
        new_caches = []
        for i in range(cfg.num_hidden_layers):
            cache = None if kv_caches is None else kv_caches[i]
            x, new_cache = LlamaLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(
                x, positions, cache, cache_index, mask)
            new_caches.append(new_cache)
        x = RMSNorm(cfg.rms_norm_eps, dtype=self.dtype, name="norm")(x)
        if kv_caches is None:
            return x, None
        return x, jnp.stack(new_caches)

    def embed(self, input_ids):
        raise NotImplementedError("use LlamaForCausalLM")


class LlamaForCausalLM(nn.Module):
    config: LlamaConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embed_tokens = nn.Embed(self.config.vocab_size, self.config.hidden_size,
                                     dtype=self.dtype, name="embed_tokens")
        self.model = LlamaModel(self.config, dtype=self.dtype)
        self.lm_head = nn.Dense(self.config.vocab_size, use_bias=False,
                                dtype=self.dtype, name="lm_head")

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(self, inputs_embeds, positions, kv_caches, cache_index, mask):
        x, new_caches = self.model(inputs_embeds, positions, kv_caches,
                                   cache_index, mask)
        return self.lm_head(x), new_caches


def causal_prefill_mask(seq_len: int, max_len: int) -> jnp.ndarray:
    """(1, 1, S, max_len) additive mask for prefill writing at positions [0, S)."""
    rows = jnp.arange(seq_len)[:, None]
    cols = jnp.arange(max_len)[None, :]
    ok = cols <= rows
    return jnp.where(ok, 0.0, -1e9)[None, None]


def decode_step_mask(cache_index, max_len: int) -> jnp.ndarray:
    """(1, 1, 1, max_len) additive mask for one decode step at cache_index."""
    cols = jnp.arange(max_len)[None, :]
    ok = cols <= cache_index
    return jnp.where(ok, 0.0, -1e9)[None, None]
