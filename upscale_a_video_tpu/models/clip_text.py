"""Minimal CLIP text encoder in flax.

The reference loads an HF ``CLIPTextModel`` from the checkpoint bundle
(pipeline_upscale_a_video.py:24,64-65); for stable-diffusion-x4-upscaler this
is the OpenCLIP ViT-H text tower (hidden 1024, 23 layers, gelu). We implement
the tower ourselves (≈120 lines) rather than depending on transformers' flax
port: full dtype control (bf16 on TPU) and no framework-version risk. The HF
tokenizer (pure python) is still used host-side.

Weight layout matches the HF state dict one-to-one for mechanical conversion
(text_model.encoder.layers.N.{self_attn,mlp,layer_norm1,layer_norm2}...).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"  # "gelu" (SD2/x4-upscaler) or "quick_gelu" (SD1)
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_dict(cls, d: dict) -> "CLIPTextConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {name}")


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        cfg = self.config
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        b, s, _ = x.shape
        q = dense("q_proj")(x).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = dense("k_proj")(x).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        v = dense("v_proj")(x).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhid,bhjd->bhij", q, k,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        scores = scores + causal_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        x = x + CLIPAttention(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                              name="self_attn")(ln("layer_norm1")(x), causal_mask)
        h = ln("layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns the final-layer hidden states (B, S, hidden) — what the UNet's
    cross-attention consumes."""

    config: CLIPTextConfig
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
            self.param_dtype,
        )
        x = tok + pos[None, :s].astype(tok.dtype)

        # causal mask, fp32 additive
        mask = jnp.triu(jnp.full((s, s), -3.4e38, dtype=jnp.float32), k=1)[None, None]

        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"layers_{i}")(x, mask)

        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="final_layer_norm")(x)
