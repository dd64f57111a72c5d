"""MPT decoder in flax — the reference's alternative LLaVA language model
(ref llava/model/language_model/mpt/modeling_mpt.py, blocks.py, attention.py;
wrapped by llava/model/language_model/llava_mpt.py).

Semantics covered (ref file:line):
- pre-norm blocks: norm_1 → attn → residual → norm_2 → MLP(GELU, 4×) →
  residual (blocks.py:22-40); low-precision LayerNorm == fp32-math LN here
  (norm.py:14-26 — we always compute norm statistics in fp32).
- single fused ``Wqkv`` projection, optional ``clip_qkv`` clamp and
  ``qk_ln`` LayerNorms on q (d_model) / k (head_dim or d_model)
  (attention.py:154-177,190-200); multiquery variant = 1 KV head
  (attention.py:204-259).
- ALiBi attention bias with MPT's power-of-two slope schedule
  ``gen_slopes`` (attention.py:283-292) and the (1, H, 1, S_k) causal form
  (attention.py:294-301) — per-query-row constants cancel in softmax, so a
  key-indexed bias is exact for causal attention, including against a
  left-aligned KV cache (the reference right-aligns by slicing,
  attention.py:36-39; both are softmax-equivalent).
- learned positional embeddings ``wpe`` when ``alibi`` is off
  (modeling_mpt.py:55-57,175-189).
- shared embedding: logits = h @ wteᵀ (custom_embedding.py ``SharedEmbedding``,
  modeling_mpt.py ``MPTForCausalLM.forward``), optional ``logit_scale``.
- ``no_bias`` strips every Linear/LayerNorm bias (modeling_mpt.py:67-72).

The public interface matches ``llama.LlamaForCausalLM`` exactly —
``embed(input_ids)`` and ``__call__(inputs_embeds, positions, kv_caches,
cache_index, mask)`` — so ``LlavaModel`` can host either decoder
(ref LlavaLlamaForCausalLM / LlavaMPTForCausalLM duality).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    """Mirrors the reference MPTConfig defaults
    (configuration_mpt.py:14-60) for the fields the decoder consumes."""

    vocab_size: int = 50368
    d_model: int = 2048
    n_layers: int = 24
    n_heads: int = 16
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    no_bias: bool = True
    alibi: bool = True
    alibi_bias_max: int = 8
    clip_qkv: Optional[float] = None
    qk_ln: bool = False
    multiquery: bool = False          # attn_type == 'multiquery_attention'
    logit_scale: Optional[float] = None
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @classmethod
    def from_dict(cls, d: dict) -> "MPTConfig":
        d = dict(d)
        attn = d.pop("attn_config", {}) or {}
        flat = {
            "alibi": attn.get("alibi", True),
            "alibi_bias_max": attn.get("alibi_bias_max", 8),
            "clip_qkv": attn.get("clip_qkv"),
            "qk_ln": attn.get("qk_ln", False),
            "multiquery": attn.get("attn_type", "") == "multiquery_attention",
        }
        known = {f.name for f in dataclasses.fields(cls)}
        flat.update({k: v for k, v in d.items() if k in known})
        # Reference checkpoints may carry logit_scale='inv_sqrt_d_model'
        # (modeling_mpt.py resolves the string to 1/sqrt(d_model)).
        if flat.get("logit_scale") == "inv_sqrt_d_model":
            d_model = flat.get("d_model", cls.d_model)
            flat["logit_scale"] = 1.0 / math.sqrt(d_model)
        elif isinstance(flat.get("logit_scale"), str):
            raise ValueError(
                f"unknown logit_scale string: {flat['logit_scale']!r}")
        return cls(**flat)


def alibi_slopes(n_heads: int, alibi_bias_max: int = 8) -> jnp.ndarray:
    """MPT's slope schedule (ref attention.py:283-292 ``gen_slopes``):
    geometric over the next power of two of n_heads, interleave-reordered
    when n_heads is not a power of two."""
    n2 = 2 ** math.ceil(math.log2(n_heads))
    m = jnp.arange(1, n2 + 1, dtype=jnp.float32) * (alibi_bias_max / n2)
    slopes = 1.0 / jnp.power(2.0, m)
    if n2 != n_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes


def alibi_key_bias(n_heads: int, max_len: int,
                   alibi_bias_max: int = 8) -> jnp.ndarray:
    """(1, H, 1, max_len) causal ALiBi bias, key-indexed.

    The reference builds ``slopes · arange(1 - S, 1)`` and right-aligns it to
    the live keys (attention.py:294-301, 36-39). With a left-aligned KV cache
    we use ``slopes · (j - (max_len - 1))`` over absolute key index j — the
    same values up to a per-query-row constant, which softmax discards."""
    rel = jnp.arange(max_len, dtype=jnp.float32) - (max_len - 1)
    return (alibi_slopes(n_heads, alibi_bias_max)[:, None, None]
            * rel[None, None, :])[None]


class _LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics and optional bias (ref norm.py
    LPLayerNorm — params stay a separate leaf so ``no_bias`` checkpoints
    convert cleanly)."""

    use_bias: bool = True
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones_init(), (c,))
        b = self.param("bias", nn.initializers.zeros_init(), (c,)) \
            if self.use_bias else None
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.eps) * w
        if b is not None:
            y = y + b
        return y.astype(x.dtype)


class MPTBlock(nn.Module):
    config: MPTConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, kv_cache, cache_index, mask):
        """x (B, S, C); kv_cache (2, B, Hkv, max_len, D) or None; mask
        (B|1, 1|H, S, L) additive (causal + ALiBi pre-added). Returns
        (x, new_kv)."""
        cfg = self.config
        h = cfg.n_heads
        hkv = 1 if cfg.multiquery else h
        d = cfg.head_dim
        bias = not cfg.no_bias
        dense = lambda f, name: nn.Dense(f, use_bias=bias, dtype=self.dtype,
                                         name=name)

        res = x
        y = _LayerNorm(bias, cfg.layer_norm_eps, self.dtype, name="norm_1")(x)
        qkv = dense(cfg.d_model + 2 * hkv * d, "attn_Wqkv")(y)
        if cfg.clip_qkv:
            qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
        q = qkv[..., :cfg.d_model]
        k = qkv[..., cfg.d_model:cfg.d_model + hkv * d]
        v = qkv[..., cfg.d_model + hkv * d:]
        if cfg.qk_ln:
            # ref attention.py:165-168: LN over the *packed* q (d_model) and
            # k (hkv·d) projections, before the head split
            q = _LayerNorm(bias, cfg.layer_norm_eps, self.dtype,
                           name="attn_q_ln")(q)
            k = _LayerNorm(bias, cfg.layer_norm_eps, self.dtype,
                           name="attn_k_ln")(k)
        b, s, _ = y.shape
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, hkv, d).transpose(0, 2, 1, 3)

        if kv_cache is not None:
            ck = jax.lax.dynamic_update_slice_in_dim(kv_cache[0], k,
                                                     cache_index, axis=2)
            cv = jax.lax.dynamic_update_slice_in_dim(kv_cache[1], v,
                                                     cache_index, axis=2)
            k_all, v_all = ck, cv
            new_cache = jnp.stack([ck, cv])
        else:
            k_all, v_all = k, v
            new_cache = None
        if hkv != h:
            k_all = jnp.repeat(k_all, h, axis=1)
            v_all = jnp.repeat(v_all, h, axis=1)

        scores = jnp.einsum("bhid,bhjd->bhij", q, k_all,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
        o = jnp.einsum("bhij,bhjd->bhid", probs, v_all)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        x = res + dense(cfg.d_model, "attn_out_proj")(o)

        res = x
        y = _LayerNorm(bias, cfg.layer_norm_eps, self.dtype, name="norm_2")(x)
        y = dense(cfg.expansion_ratio * cfg.d_model, "ffn_up_proj")(y)
        y = dense(cfg.d_model, "ffn_down_proj")(
            jax.nn.gelu(y, approximate=False))
        return res + y, new_cache


class MPTForCausalLM(nn.Module):
    """Interface-compatible with ``llama.LlamaForCausalLM`` so the LLaVA
    wrapper and captioner host either decoder unchanged."""

    config: MPTConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        self.wte = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                            name="wte")
        if not cfg.alibi:
            self.wpe = nn.Embed(cfg.max_seq_len, cfg.d_model,
                                dtype=self.dtype, name="wpe")
        self.blocks = [MPTBlock(cfg, dtype=self.dtype, name=f"blocks_{i}")
                       for i in range(cfg.n_layers)]
        self.norm_f = _LayerNorm(not cfg.no_bias, cfg.layer_norm_eps,
                                 self.dtype, name="norm_f")

    def embed(self, input_ids):
        return self.wte(input_ids)

    def __call__(self, inputs_embeds, positions, kv_caches, cache_index, mask):
        """inputs_embeds (B, S, C); positions (S,) absolute; kv_caches
        (L, 2, B, Hkv, max_len, D) or None; mask (B|1, 1, S, L) additive
        causal/padding mask (ALiBi is added here). Returns (logits, caches)."""
        cfg = self.config
        x = inputs_embeds
        if not cfg.alibi:
            x = x + self.wpe(positions)[None].astype(x.dtype)
        max_len = mask.shape[-1]
        if cfg.alibi:
            mask = mask + alibi_key_bias(cfg.n_heads, max_len,
                                         cfg.alibi_bias_max)
        new_caches = []
        for i, block in enumerate(self.blocks):
            cache = None if kv_caches is None else kv_caches[i]
            x, new_cache = block(x, cache, cache_index, mask)
            new_caches.append(new_cache)
        x = self.norm_f(x)
        logits = self.wte.attend(x.astype(self.wte.embedding.dtype))
        if cfg.logit_scale is not None:
            logits = logits * cfg.logit_scale
        if kv_caches is None:
            return logits, None
        return logits, jnp.stack(new_caches)
