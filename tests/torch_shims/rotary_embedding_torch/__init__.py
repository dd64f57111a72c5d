"""rotary-embedding-torch 0.2.3 shim: RotaryEmbedding exactly as the pinned
library computes it (interleaved-pair "GPT-J style" rotation, freqs repeated
(n r) with r=2, applied to the leading ``dim`` channels with positions taken
from dim -2). Used by the reference UNet's temporal attention
(unet_video.py:203, attention.py:709-711)."""

import torch
import torch.nn as nn
from einops import rearrange, repeat


def exists(val):
    return val is not None


def broadcat(tensors, dim=-1):
    return torch.cat(tensors, dim=dim)


def rotate_half(x):
    x = rearrange(x, "... (d r) -> ... d r", r=2)
    x1, x2 = x.unbind(dim=-1)
    x = torch.stack((-x2, x1), dim=-1)
    return rearrange(x, "... d r -> ... (d r)")


def apply_rotary_emb(freqs, t, start_index=0):
    freqs = freqs.to(t.dtype)
    rot_dim = freqs.shape[-1]
    end_index = start_index + rot_dim
    assert rot_dim <= t.shape[-1], (
        f"feature dim {t.shape[-1]} too small for rotary dim {rot_dim}")
    t_left, t_mid, t_right = (t[..., :start_index],
                              t[..., start_index:end_index],
                              t[..., end_index:])
    t_mid = (t_mid * freqs.cos()) + (rotate_half(t_mid) * freqs.sin())
    return torch.cat((t_left, t_mid, t_right), dim=-1)


class RotaryEmbedding(nn.Module):
    def __init__(
        self,
        dim,
        custom_freqs=None,
        freqs_for="lang",
        theta=10000,
        max_freq=10,
        num_freqs=1,
        learned_freq=False,
    ):
        super().__init__()
        if exists(custom_freqs):
            freqs = custom_freqs
        elif freqs_for == "lang":
            freqs = 1.0 / (theta ** (
                torch.arange(0, dim, 2)[: dim // 2].float() / dim))
        elif freqs_for == "pixel":
            freqs = torch.linspace(1.0, max_freq / 2, dim // 2) * torch.pi
        elif freqs_for == "constant":
            freqs = torch.ones(num_freqs).float()
        else:
            raise ValueError(freqs_for)

        self.cache = {}
        if learned_freq:
            self.freqs = nn.Parameter(freqs)
        else:
            self.register_buffer("freqs", freqs)

    def rotate_queries_or_keys(self, t, seq_dim=-2, offset=0):
        device, seq_len = t.device, t.shape[seq_dim]
        freqs = self.forward(
            lambda: torch.arange(seq_len, device=device) + offset,
            cache_key=f"freqs:{seq_len}|offset:{offset}")
        return apply_rotary_emb(freqs, t)

    def forward(self, t, cache_key=None):
        if exists(cache_key) and cache_key in self.cache:
            return self.cache[cache_key]
        if callable(t):
            t = t()
        freqs = self.freqs
        freqs = torch.einsum("..., f -> ... f", t.type(freqs.dtype), freqs)
        freqs = repeat(freqs, "... n -> ... (n r)", r=2)
        if exists(cache_key):
            self.cache[cache_key] = freqs
        return freqs
