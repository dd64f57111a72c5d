"""CLIP vision tower for the captioner (ref llava/model/multimodal_encoder/
clip_encoder.py — wraps HF CLIPVisionModel, selects a hidden layer's patch
tokens).

Flax implementation of the ViT: patchify conv → class token + position
embeddings → pre-LN transformer. ``feature_layer`` selects which encoder
layer's hidden states feed the projector (LLaVA uses -2, patch tokens only,
ref clip_encoder.py feature_select)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @classmethod
    def from_dict(cls, d: dict) -> "CLIPVisionConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


class _VisionLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h_ = cfg.num_attention_heads
        d = cfg.hidden_size // h_
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                       name=name)
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)

        res = x
        y = ln("layer_norm1")(x)
        b, s, _ = y.shape
        # names use the self_attn_ prefix so the converter maps them to the HF
        # "self_attn.q_proj" keys without colliding with vision/text renames
        q = dense(cfg.hidden_size, "self_attn_q_proj")(y).reshape(b, s, h_, d).transpose(0, 2, 1, 3)
        k = dense(cfg.hidden_size, "self_attn_k_proj")(y).reshape(b, s, h_, d).transpose(0, 2, 1, 3)
        v = dense(cfg.hidden_size, "self_attn_v_proj")(y).reshape(b, s, h_, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhid,bhjd->bhij", q, k,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhij,bhjd->bhid", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        x = res + dense(cfg.hidden_size, "self_attn_out_proj")(o)

        res = x
        y = ln("layer_norm2")(x)
        y = dense(cfg.intermediate_size, "mlp_fc1")(y)
        y = _act(cfg.hidden_act)(y)
        y = dense(cfg.hidden_size, "mlp_fc2")(y)
        return res + y


class CLIPVisionTower(nn.Module):
    """(B, H, W, 3) normalized pixels → (B, num_patches, hidden) features from
    ``feature_layer`` (negative index into encoder layers; patch tokens only)."""

    config: CLIPVisionConfig
    feature_layer: int = -2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.config
        b = pixels.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(pixels)
        n = patches.shape[1] * patches.shape[2]
        patches = patches.reshape(b, n, cfg.hidden_size)

        cls_tok = self.param("class_embedding", nn.initializers.normal(0.02),
                             (cfg.hidden_size,))
        cls = jnp.broadcast_to(cls_tok.astype(patches.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)

        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n + 1, cfg.hidden_size))
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x)

        # run to the selected layer; LLaVA takes the (-2)th layer's output
        n_layers = cfg.num_hidden_layers + self.feature_layer + 1 \
            if self.feature_layer < 0 else self.feature_layer + 1
        hidden = x
        for i in range(cfg.num_hidden_layers):
            hidden = _VisionLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(hidden)
            if i == n_layers - 1:
                return hidden[:, 1:]  # drop CLS (ref feature_select 'patch')
        return hidden[:, 1:]
