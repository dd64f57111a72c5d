"""AttentionBlock / FeedForward / AdaLayerNorm with diffusers-0.16 numerics
(diffusers/models/attention.py @ 0.16.0). AttentionBlock is load-bearing: the
reference's VAE mid block applies it per frame (unet_blocks.py:736-742)."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class AttentionBlock(nn.Module):
    def __init__(
        self,
        channels: int,
        num_head_channels: int = None,
        norm_num_groups: int = 32,
        rescale_output_factor: float = 1.0,
        eps: float = 1e-5,
    ):
        super().__init__()
        self.channels = channels
        self.num_heads = (channels // num_head_channels
                          if num_head_channels is not None else 1)
        self.num_head_size = num_head_channels
        self.group_norm = nn.GroupNorm(num_channels=channels,
                                       num_groups=norm_num_groups, eps=eps,
                                       affine=True)
        self.query = nn.Linear(channels, channels)
        self.key = nn.Linear(channels, channels)
        self.value = nn.Linear(channels, channels)
        self.rescale_output_factor = rescale_output_factor
        self.proj_attn = nn.Linear(channels, channels)
        # probed by the reference pipeline's fp32-decode branch
        # (pipeline_upscale_a_video.py:673)
        self._use_memory_efficient_attention_xformers = False

    def reshape_heads_to_batch_dim(self, tensor):
        b, seq, dim = tensor.shape
        h = self.num_heads
        tensor = tensor.reshape(b, seq, h, dim // h)
        return tensor.permute(0, 2, 1, 3).reshape(b * h, seq, dim // h)

    def reshape_batch_dim_to_heads(self, tensor):
        bh, seq, dim = tensor.shape
        h = self.num_heads
        tensor = tensor.reshape(bh // h, h, seq, dim)
        return tensor.permute(0, 2, 1, 3).reshape(bh // h, seq, dim * h)

    def forward(self, hidden_states):
        residual = hidden_states
        batch, channel, height, width = hidden_states.shape

        hidden_states = self.group_norm(hidden_states)
        hidden_states = hidden_states.view(
            batch, channel, height * width).transpose(1, 2)

        query_proj = self.reshape_heads_to_batch_dim(self.query(hidden_states))
        key_proj = self.reshape_heads_to_batch_dim(self.key(hidden_states))
        value_proj = self.reshape_heads_to_batch_dim(self.value(hidden_states))

        scale = 1 / math.sqrt(self.channels / self.num_heads)
        attention_scores = torch.baddbmm(
            torch.empty(query_proj.shape[0], query_proj.shape[1],
                        key_proj.shape[1], dtype=query_proj.dtype,
                        device=query_proj.device),
            query_proj, key_proj.transpose(-1, -2), beta=0, alpha=scale)
        attention_probs = torch.softmax(
            attention_scores.float(), dim=-1).type(attention_scores.dtype)

        hidden_states = torch.bmm(attention_probs, value_proj)
        hidden_states = self.reshape_batch_dim_to_heads(hidden_states)
        hidden_states = self.proj_attn(hidden_states)

        hidden_states = hidden_states.transpose(-1, -2).reshape(
            batch, channel, height, width)
        return (hidden_states + residual) / self.rescale_output_factor


class GEGLU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, hidden_states):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class GELU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, hidden_states):
        return F.gelu(self.proj(hidden_states))


class ApproximateGELU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


class FeedForward(nn.Module):
    def __init__(self, dim: int, dim_out: int = None, mult: int = 4,
                 dropout: float = 0.0, activation_fn: str = "geglu",
                 final_dropout: bool = False):
        super().__init__()
        inner_dim = int(dim * mult)
        dim_out = dim_out or dim

        if activation_fn == "gelu":
            act_fn = GELU(dim, inner_dim)
        elif activation_fn == "geglu":
            act_fn = GEGLU(dim, inner_dim)
        elif activation_fn == "geglu-approximate":
            act_fn = ApproximateGELU(dim, inner_dim)
        else:
            raise ValueError(activation_fn)

        self.net = nn.ModuleList([])
        self.net.append(act_fn)
        self.net.append(nn.Dropout(dropout))
        self.net.append(nn.Linear(inner_dim, dim_out))
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, hidden_states):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


class AdaLayerNorm(nn.Module):
    def __init__(self, embedding_dim: int, num_embeddings: int):
        super().__init__()
        self.emb = nn.Embedding(num_embeddings, embedding_dim)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, embedding_dim * 2)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False)

    def forward(self, x, timestep):
        emb = self.linear(self.silu(self.emb(timestep)))
        scale, shift = torch.chunk(emb, 2)
        return self.norm(x) * (1 + scale) + shift
