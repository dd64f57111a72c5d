"""Attention modules: spatial/cross attention, temporal attention with RoPE +
T5 relative-position bias, the per-block transformer, and the VAE's spatial
attention block.

Mirrors the semantics (not the structure) of
`/root/reference/models_video/attention.py` and the vendored diffusers
``AttentionBlock`` (diffusers_attention.py:249). All modules take channels-last
tensors; token reshapes are pure ``reshape``/``transpose`` that XLA folds into
the surrounding ops.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention
from ..ops.relpos import relative_position_buckets
from ..ops.rope import apply_rotary


def _split_heads(x: jax.Array, heads: int) -> jax.Array:
    """(B, S, H*D) -> (B, H, S, D)"""
    b, s, hd = x.shape
    return x.reshape(b, s, heads, hd // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, S, D) -> (B, S, H*D)"""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class CrossAttention(nn.Module):
    """Multi-head attention with separate q and kv inputs
    (ref attention.py:44-289; released config: no qkv bias, no group_norm,
    upcast flags off)."""

    query_dim: int
    cross_attention_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    bias: bool = False
    zero_init_out: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        attention_bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        kv = hidden_states if encoder_hidden_states is None else encoder_hidden_states

        q = nn.Dense(inner, use_bias=self.bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_q")(hidden_states)
        k = nn.Dense(inner, use_bias=self.bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_k")(kv)
        v = nn.Dense(inner, use_bias=self.bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_v")(kv)

        q = _split_heads(q, self.heads)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)

        out = attention(q, k, v, scale=self.dim_head**-0.5, bias=attention_bias)
        out = _merge_heads(out)

        out_init = (
            nn.initializers.zeros_init() if self.zero_init_out else nn.initializers.lecun_normal()
        )
        return nn.Dense(
            self.query_dim, use_bias=True, kernel_init=out_init, dtype=self.dtype,
            param_dtype=self.param_dtype, name="to_out_0",
        )(out)


class TemporalAttention(nn.Module):
    """Attention across frames, per pixel (ref attention.py:626-733).

    Input is (B', T, C) with B' = batch × tokens. Adds (a) a T5-bucketed
    relative-position bias (attention.py:641,645,715), (b) rotary embedding on
    the first 32 channels of q/k (attention.py:709-711), (c) running-max
    subtraction for stability (attention.py:722 — subsumed by the fp32 softmax
    here but kept for exact logit parity). Output projection is zero-initialized
    at init time (attention.py:490).
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    rel_pos_num_buckets: int = 32
    rel_pos_max_distance: int = 32
    rope_dim: int = 32
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        inner = self.heads * self.dim_head
        t = hidden_states.shape[1]

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_q")(hidden_states)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_k")(hidden_states)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_v")(hidden_states)

        # T5 relative position bias: static (T, T) bucket table → (H, T, T) bias.
        buckets = relative_position_buckets(
            t, self.rel_pos_num_buckets, self.rel_pos_max_distance
        )  # np (T, T)
        bias_table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(stddev=1.0),
            (self.rel_pos_num_buckets, self.heads),
            self.param_dtype,
        )
        bias_hss = bias_table[jnp.asarray(buckets)].transpose(2, 0, 1)  # (H,T,T)

        rot = min(self.rope_dim, self.dim_head)
        b_, inner_d = q.shape[0], self.dim_head

        from ..ops.fused_temporal_attention import (
            fused_temporal_attention,
            fused_temporal_attention_fits,
        )

        if (jax.devices()[0].platform == "tpu"
                and fused_temporal_attention_fits(b_, t, self.heads, inner_d)):
            # fused path: one Pallas pass in the (B', T, H, D) layout; q/k/v
            # cross HBM once (see ops/fused_temporal_attention.py)
            qh = q.reshape(b_, t, self.heads, inner_d) * (inner_d**-0.5)
            kh = k.reshape(b_, t, self.heads, inner_d)
            qh = apply_rotary(qh, rot_dim=rot, seq_axis=-3)
            kh = apply_rotary(kh, rot_dim=rot, seq_axis=-3)
            vh = v.reshape(b_, t, self.heads, inner_d)
            out = fused_temporal_attention(qh, kh, vh, bias_hss)
            out = out.reshape(b_, t, inner)
        else:
            q = _split_heads(q, self.heads)  # (B', H, T, D)
            k = _split_heads(k, self.heads)
            v = _split_heads(v, self.heads)

            # Reference order: q is pre-scaled BEFORE RoPE (attention.py:705);
            # rotation is norm-preserving so scale placement is equivalent,
            # but we match it exactly.
            q = q * (self.dim_head**-0.5)
            q = apply_rotary(q, rot_dim=rot)
            k = apply_rotary(k, rot_dim=rot)

            out = attention(q, k, v, scale=1.0, bias=bias_hss[None],
                            subtract_max=True)
            out = _merge_heads(out)

        return nn.Dense(
            self.query_dim, use_bias=True, kernel_init=nn.initializers.zeros_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="to_out_0",
        )(out)


class SparseCausalAttention(nn.Module):
    """Self-attention whose K/V are the concat of frame-0 and previous-frame
    tokens (ref attention.py:567-623). Disabled in the released config
    (use_first_frame=false) but part of the capability surface.

    Input: (B·F, S, C) per-frame tokens + video_length."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array, video_length: int) -> jax.Array:
        inner = self.heads * self.dim_head
        bf, s, c = hidden_states.shape
        b = bf // video_length

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_q")(hidden_states)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_k")(hidden_states)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_v")(hidden_states)

        former = np.maximum(np.arange(video_length) - 1, 0)
        first = np.zeros(video_length, dtype=np.int64)

        def causal_concat(x):
            t = x.reshape(b, video_length, s, inner)
            out = jnp.concatenate([t[:, first], t[:, former]], axis=2)
            return out.reshape(bf, 2 * s, inner)

        k = causal_concat(k)
        v = causal_concat(v)

        qh = _split_heads(q, self.heads)
        kh = _split_heads(k, self.heads)
        vh = _split_heads(v, self.heads)
        out = attention(qh, kh, vh, scale=self.dim_head**-0.5)
        out = _merge_heads(out)
        return nn.Dense(self.query_dim, use_bias=True, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    """GEGLU MLP, mult=4 (diffusers FeedForward as used at attention.py:493)."""

    dim: int
    mult: int = 4
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = GEGLU(self.dim * self.mult, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="net_2")(h)


class _TemporalAttnParams(nn.Module):
    """Param twin of TemporalAttention for the fused kernel path: same
    to_q/to_k/to_v/relative_attention_bias/to_out_0 tree; returns the raw
    weights + the materialized (H, T, T) rel-pos bias."""

    query_dim: int
    heads: int
    dim_head: int
    rel_pos_num_buckets: int = 32
    rel_pos_max_distance: int = 32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: int):
        from .blocks import _DenseParams

        inner = self.heads * self.dim_head
        wq, _ = _DenseParams(inner, self.param_dtype, use_bias=False,
                             name="to_q")(self.query_dim)
        wk, _ = _DenseParams(inner, self.param_dtype, use_bias=False,
                             name="to_k")(self.query_dim)
        wv, _ = _DenseParams(inner, self.param_dtype, use_bias=False,
                             name="to_v")(self.query_dim)
        buckets = relative_position_buckets(
            t, self.rel_pos_num_buckets, self.rel_pos_max_distance)
        bias_table = self.param(
            "relative_attention_bias", nn.initializers.normal(stddev=1.0),
            (self.rel_pos_num_buckets, self.heads), self.param_dtype)
        bias_hss = bias_table[jnp.asarray(buckets)].transpose(2, 0, 1)
        wo, bo = _DenseParams(self.query_dim, self.param_dtype,
                              kernel_init=nn.initializers.zeros_init(),
                              name="to_out_0")(inner)
        return wq, wk, wv, wo, bo, bias_hss


class _FFParams(nn.Module):
    """Param twin of FeedForward (GEGLU net_0/proj + net_2) for the fused
    LN+GEGLU kernel path (ops/fused_feedforward.py)."""

    dim: int
    param_dtype: jnp.dtype = jnp.float32
    mult: int = 4

    @nn.compact
    def __call__(self):
        from .blocks import _DenseParams

        hid = self.dim * self.mult

        class _Net0(nn.Module):
            param_dtype: jnp.dtype
            dim: int
            hid: int

            @nn.compact
            def __call__(self):
                return _DenseParams(self.hid * 2, self.param_dtype,
                                    name="proj")(self.dim)

        w1, b1 = _Net0(self.param_dtype, self.dim, hid, name="net_0")()
        w2, b2 = _DenseParams(self.dim, self.param_dtype, name="net_2")(hid)
        return w1, b1, w2, b2


class _FusedCrossParams(nn.Module):
    """Param twin of CrossAttention for the fused short-KV kernel path:
    declares the identical to_q/to_k/to_v/to_out_0 tree; computes k/v on the
    (unrepeated) context in XLA (tiny) and returns the raw q/out weights for
    ops/cross_attention_block.py."""

    query_dim: int
    cross_attention_dim: int
    heads: int
    dim_head: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, kv_src: jax.Array):
        from .blocks import _DenseParams

        inner = self.heads * self.dim_head
        wq, _ = _DenseParams(inner, self.param_dtype, use_bias=False,
                             name="to_q")(self.query_dim)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_k")(kv_src)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_v")(kv_src)
        wo, bo = _DenseParams(self.query_dim, self.param_dtype,
                              name="to_out_0")(inner)
        return wq, k, v, wo, bo


class BasicTransformerBlock(nn.Module):
    """attn1 (self or text-cross) → attn2 (text cross) → temporal attention →
    GEGLU FF (ref attention.py:414-564).

    Inputs: ``hidden_states`` (B*T, S, C) per-frame tokens; ``context``
    (B*T, S_txt, C_txt); ``video_length`` T for the temporal reshape.

    On TPU the two text cross-attentions (+ their LayerNorms) run as one
    fused Pallas pass each (ops/cross_attention_block.py) — same math, same
    parameter tree, one HBM round-trip instead of ~8.
    """

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    only_cross_attention: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    def _cached(self, compute, cache, flag):
        """Pyramid-Attention-Broadcast hook: reuse the cached attention delta
        when ``flag`` is true, else recompute (PAPERS.md: PAB — attention
        outputs drift slowly across denoise steps). ``lax.cond`` skips the
        attention compute entirely on broadcast steps at runtime. During init
        we always compute so flax creates the params. A leafless marker cache
        (the () placeholder from make_pab_collect_cache) means "collect on
        this call" — compute directly."""
        if (cache is None or self.is_initializing()
                or not hasattr(cache, "dtype")):
            return compute()
        return jax.lax.cond(flag, lambda: cache, compute)

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        context: Optional[jax.Array],
        video_length: int,
        attn_cache: Optional[dict] = None,
        use_flags: Optional[dict] = None,
    ):
        """Returns hidden_states, or (hidden_states, new_cache) when
        ``attn_cache`` is given. Cache entries are the attention *deltas*
        (post-projection outputs before the residual add)."""
        import os

        from .blocks import _GNParams
        from ..ops.cross_attention_block import (
            cross_attention_block_fits, fused_cross_attention_block)

        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        want_cache = attn_cache is not None
        cache_in = attn_cache or {}
        flags = use_flags or {}
        new_cache = {}
        # {} caches every kind (original behavior); a marker dict restricts
        # caching to its keys (make_pab_collect_cache kinds=...)
        cache_key = (lambda key: not cache_in or key in cache_in)

        fuse_cross = (
            context is not None
            and (jax.devices()[0].platform == "tpu"
                 or os.environ.get("UAV_FORCE_FUSED_CROSS"))
            and not os.environ.get("UAV_NO_FUSED_CROSS")
            and cross_attention_block_fits(hidden_states.shape,
                                           context.shape[-2], self.heads,
                                           self.dim_head)
        )
        # the per-clip context: frames share it (Transformer3DModel repeats
        # it per frame; slicing every T-th row recovers the clip batch)
        kv_src = context[::video_length] if fuse_cross else None

        # exact/no-PAB path: fold each residual add into the Pallas kernels
        # (they hold x in VMEM anyway; the standalone XLA adds were ~29 ms
        # per 320² step). With caching the delta must exist separately.
        fold_res = not want_cache

        def fused_cross(norm_name, attn_name):
            lns, lnb = _GNParams(self.dim, self.param_dtype, name=norm_name)()
            wq, k, v, wo, bo = _FusedCrossParams(
                query_dim=self.dim, cross_attention_dim=context.shape[-1],
                heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
                param_dtype=self.param_dtype, name=attn_name)(kv_src)
            def compute(x, add_residual=False):
                return fused_cross_attention_block(
                    x, lns, lnb, wq, k, v, wo, bo, heads=self.heads,
                    dim_head=self.dim_head, t_repeat=video_length,
                    add_residual=add_residual)
            return compute

        # attn1: text-cross when only_cross_attention (3 of 4 levels in the
        # released config), otherwise spatial self-attention per frame.
        kind1 = "cross" if self.only_cross_attention else "spatial"
        if self.only_cross_attention and fuse_cross:
            compute1 = fused_cross("norm1", "attn1")
            hs1 = hidden_states
            if fold_res:
                hidden_states = compute1(hs1, add_residual=True)
                d1 = None
            else:
                d1 = self._cached(lambda: compute1(hs1),
                                  cache_in.get("attn1"),
                                  flags.get(kind1, False))
        else:
            h = ln("norm1")(hidden_states)
            attn1 = CrossAttention(
                query_dim=self.dim,
                cross_attention_dim=self.cross_attention_dim if self.only_cross_attention else None,
                heads=self.heads, dim_head=self.dim_head,
                dtype=self.dtype, param_dtype=self.param_dtype, name="attn1",
            )
            d1 = self._cached(
                lambda: attn1(h, context if self.only_cross_attention else None),
                cache_in.get("attn1"), flags.get(kind1, False),
            )
        if cache_key("attn1") and d1 is not None:
            new_cache["attn1"] = d1
        if d1 is not None:
            hidden_states = d1 + hidden_states

        # attn2: text cross-attention
        if self.cross_attention_dim is not None:
            if fuse_cross:
                compute2 = fused_cross("norm2", "attn2")
                hs2 = hidden_states
                if fold_res:
                    hidden_states = compute2(hs2, add_residual=True)
                    d2 = None
                else:
                    d2 = self._cached(lambda: compute2(hs2),
                                      cache_in.get("attn2"),
                                      flags.get("cross", False))
            else:
                h = ln("norm2")(hidden_states)
                attn2 = CrossAttention(
                    query_dim=self.dim, cross_attention_dim=self.cross_attention_dim,
                    heads=self.heads, dim_head=self.dim_head,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="attn2",
                )
                d2 = self._cached(lambda: attn2(h, context),
                                  cache_in.get("attn2"), flags.get("cross", False))
            if cache_key("attn2") and d2 is not None:
                new_cache["attn2"] = d2
            if d2 is not None:
                hidden_states = d2 + hidden_states

        # temporal attention (ref attention.py:553-560). On TPU the whole
        # step — both layout transposes, LN, q/k/v with RoPE, packed T=8
        # attention with the T5 bias, out-proj — is one Pallas pass in the
        # native (B·T, S, C) layout (ops/temporal_attention_block.py).
        from ..ops.temporal_attention_block import (
            fused_temporal_attention_block, temporal_attention_block_fits)

        bt, s, c = hidden_states.shape
        b = bt // video_length
        fuse_temporal = (
            (jax.devices()[0].platform == "tpu"
             or os.environ.get("UAV_FORCE_FUSED_TEMPORAL"))
            and not os.environ.get("UAV_NO_FUSED_TEMPORAL")
            and temporal_attention_block_fits(hidden_states.shape,
                                              video_length, self.heads)
        )
        if fuse_temporal:
            from .blocks import _GNParams
            lnst, lnbt = _GNParams(self.dim, self.param_dtype,
                                   name="norm_temporal")()
            wq, wk, wv, wo, bo, bias_hss = _TemporalAttnParams(
                query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                param_dtype=self.param_dtype, name="attn_temporal",
            )(video_length)
            hst = hidden_states
            if fold_res:
                hidden_states = fused_temporal_attention_block(
                    hst, lnst, lnbt, wq, wk, wv, wo, bo, bias_hss,
                    video_length=video_length, add_residual=True)
            else:
                dt_ = self._cached(
                    lambda: fused_temporal_attention_block(
                        hst, lnst, lnbt, wq, wk, wv, wo, bo, bias_hss,
                        video_length=video_length),
                    cache_in.get("attn_temporal"),
                    flags.get("temporal", False))
                if cache_key("attn_temporal"):
                    new_cache["attn_temporal"] = dt_
                hidden_states = dt_ + hidden_states
        else:
            x = hidden_states.reshape(b, video_length, s, c).transpose(0, 2, 1, 3)
            x = x.reshape(b * s, video_length, c)
            h = ln("norm_temporal")(x)
            attn_t = TemporalAttention(
                query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                dtype=self.dtype, param_dtype=self.param_dtype, name="attn_temporal",
            )
            dt_ = self._cached(lambda: attn_t(h), cache_in.get("attn_temporal"),
                               flags.get("temporal", False))
            if cache_key("attn_temporal"):
                new_cache["attn_temporal"] = dt_
            x = dt_ + x
            x = x.reshape(b, s, video_length, c).transpose(0, 2, 1, 3)
            hidden_states = x.reshape(bt, s, c)

        # feed-forward
        from ..ops.fused_feedforward import feedforward_fits, fused_feedforward

        fuse_ff = (
            (jax.devices()[0].platform == "tpu"
             or os.environ.get("UAV_FORCE_FUSED_FF"))
            and not os.environ.get("UAV_NO_FUSED_FF")
            and feedforward_fits(hidden_states.shape)
        )
        if fuse_ff:
            lns3, lnb3 = _GNParams(self.dim, self.param_dtype, name="norm3")()
            w1, b1, w2, b2 = _FFParams(self.dim, self.param_dtype,
                                       name="ff")()
            hidden_states = fused_feedforward(
                hidden_states, lns3, lnb3, w1, b1, w2, b2, add_residual=True)
        else:
            h = ln("norm3")(hidden_states)
            hidden_states = FeedForward(
                self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="ff"
            )(h) + hidden_states
        if want_cache:
            return hidden_states, new_cache
        return hidden_states


class Transformer3DModel(nn.Module):
    """Per-level spatial transformer, extended for VSR with a leading (3,1,1)
    temporal resblock (ref attention.py:292-411).

    Input/output: (B, T, H, W, C) video tensor. ``context``: (B, S_txt, C_txt).
    """

    heads: int
    dim_head: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 32
    use_linear_projection: bool = True
    only_cross_attention: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array],
                 attn_cache=None, use_flags=None):
        from .blocks import ResnetBlock3DCNN  # local import to avoid cycle

        b, t, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        want_cache = attn_cache is not None

        # 3D CNN for VSR (ref attention.py:323,368-371)
        x = ResnetBlock3DCNN(
            in_channels=self.in_channels, temporal_kernel=(3, 1, 1), temb_channels=None,
            groups=min(32, self.norm_num_groups), groups_out=min(32, self.norm_num_groups),
            dtype=self.dtype, param_dtype=self.param_dtype, name="resblock_temporal",
        )(x)

        residual = x
        # per-frame GroupNorm (stats exclude T: ref normalizes (b f) c h w,
        # attention.py:363,374). LeanGroupNorm ≡ nn.GroupNorm (same params,
        # same f32 stats) without materializing an f32 activation copy.
        from .blocks import LeanGroupNorm
        flat = x.reshape(b * t, hh, ww, c)
        h = LeanGroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
            param_dtype=self.param_dtype, name="norm",
        )(flat)
        tokens = h.reshape(b * t, hh * ww, c)
        if self.use_linear_projection:
            tokens = nn.Dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                              name="proj_in")(tokens)
        else:
            tokens = nn.Dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                              name="proj_in")(tokens)  # 1x1 conv == dense on tokens

        ctx = None
        if context is not None:
            # repeat per frame: (B, S, C) -> (B*T, S, C)
            ctx = jnp.repeat(context, t, axis=0)

        new_caches = []
        for i in range(self.num_layers):
            block = BasicTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                only_cross_attention=self.only_cross_attention,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"transformer_blocks_{i}",
            )
            if want_cache:
                tokens, cache_i = block(tokens, ctx, video_length=t,
                                        attn_cache=attn_cache[i],
                                        use_flags=use_flags)
                new_caches.append(cache_i)
            else:
                tokens = block(tokens, ctx, video_length=t)

        tokens = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="proj_out")(tokens)
        # Residual add in token space: both operands are row-major
        # (B·T, H·W, C) matmul-adjacent values, so the add fuses into the
        # proj_out epilogue. Adding after the spatial reshape instead makes
        # XLA materialize a transposed 6-D copy+reshape+add chain
        # (~25 ms/step at 320² in the op trace). Exact: fp add is
        # shape-agnostic and both reshapes are pure dim merges/splits.
        tokens = tokens + residual.reshape(b * t, hh * ww, c)
        out = tokens.reshape(b, t, hh, ww, c)
        if want_cache:
            return out, tuple(new_caches)
        return out


class SpatialAttentionBlock(nn.Module):
    """Per-frame single-head spatial self-attention used in the VAE mid block
    (vendored diffusers AttentionBlock, diffusers_attention.py:249; applied
    per frame at unet_blocks.py:736-742).

    Input/output: (B, T, H, W, C).
    """

    channels: int
    num_head_channels: Optional[int] = None
    norm_num_groups: int = 32
    eps: float = 1e-6
    rescale_output_factor: float = 1.0
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, hh, ww, c = x.shape
        heads = c // self.num_head_channels if self.num_head_channels is not None else 1

        flat = x.reshape(b * t, hh, ww, c)
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=self.eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="group_norm")(flat)
        tokens = h.reshape(b * t, hh * ww, c)

        q = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="query")(tokens)
        k = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="key")(tokens)
        v = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="value")(tokens)

        q = _split_heads(q, heads)
        k = _split_heads(k, heads)
        v = _split_heads(v, heads)
        # bf16-operand attention on the fp32 decode path (default): the TPU
        # MXU truncates matmul operands to bf16 per pass at the default f32
        # precision anyway (measured: flash f32 rel-err 4.6e-3 vs f64, flash
        # bf16 5.1e-3 — same accuracy class; multi-pass f32 emulation is not
        # available inside Mosaic kernels), so f32 q/k/v storage only adds
        # HBM traffic, not accuracy. Softmax and accumulation stay f32 in
        # both. This mirrors the reference enabling memory-efficient
        # attention on its forced-fp32 VAE (pipeline_upscale_a_video.py:
        # 672-673). UAV_VAE_ATTN_F32=1 restores f32 operands (same MXU
        # precision, 2× operand traffic); probe: scripts/attn_precision.py.
        import os

        attn_dtype = q.dtype
        if (q.dtype == jnp.float32
                and not os.environ.get("UAV_VAE_ATTN_F32")):
            q, k, v = (a.astype(jnp.bfloat16) for a in (q, k, v))
        out = attention(q, k, v, scale=1.0 / np.sqrt(c / heads))
        out = _merge_heads(out).astype(attn_dtype)

        out = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_attn")(out)
        out = out.reshape(b, t, hh, ww, c)
        return (out + x.reshape(b, t, hh, ww, c)) / self.rescale_output_factor
