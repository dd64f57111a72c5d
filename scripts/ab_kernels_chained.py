"""Chained re-verification of the fused kernels vs XLA."""
import sys, functools
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
import numpy as np
from _timing import timed_chained
from upscale_a_video_tpu.ops.fused_temporal_resblock import (
    fused_temporal_resblock, fused_temporal_resblock_reference)
from upscale_a_video_tpu.ops.cross_attention_block import fused_cross_attention_block
from upscale_a_video_tpu.ops.attention import attention_xla

# ---- temporal resblock (x -> out same shape: already residual) ----
def rb(b, t, hw, c, k1, temb=True):
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(ks[0], (b, t, hw, hw, c), jnp.bfloat16)
    a = dict(
        n1_scale=1 + 0.1*jax.random.normal(ks[1], (c,)), n1_bias=0.1*jax.random.normal(ks[2], (c,)),
        w1=0.05*jax.random.normal(ks[3], (k1,1,1,c,c)), b1=0.1*jax.random.normal(ks[4], (c,)),
        temb_proj=0.1*jax.random.normal(ks[5], (b, c)) if temb else None,
        n2_scale=1 + 0.1*jax.random.normal(ks[6], (c,)), n2_bias=0.1*jax.random.normal(ks[7], (c,)),
        w2=0.05*jax.random.normal(ks[8], (3,1,1,c,c)), b2=0.1*jax.random.normal(ks[9], (c,)))
    fused = jax.jit(lambda x: fused_temporal_resblock(
        x, a["n1_scale"], a["n1_bias"], a["w1"], a["b1"], a["temb_proj"],
        a["n2_scale"], a["n2_bias"], a["w2"], a["b2"], groups=32, use_pallas=True))
    ref = jax.jit(lambda x: fused_temporal_resblock_reference(
        x, a["n1_scale"], a["n1_bias"], a["w1"], a["b1"], a["temb_proj"],
        a["n2_scale"], a["n2_bias"], a["w2"], a["b2"], 32, 1e-6, dtype=jnp.bfloat16))
    timed_chained(f"resblock fused {hw}2 c{c} k{k1}", fused, x)
    timed_chained(f"resblock xla   {hw}2 c{c} k{k1}", ref, x)

rb(2, 8, 256, 256, 5)
rb(2, 8, 128, 512, 5)
rb(2, 8, 128, 512, 3, temb=False)

# ---- cross attention block (delta + x for feedback) ----
def ca(bt, s, c, t=8, skv=77):
    heads, d = 8, c // 8
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    x = jax.random.normal(ks[0], (bt, s, c), jnp.bfloat16)
    lns = 1 + 0.1*jax.random.normal(ks[1], (c,)); lnb = 0.1*jax.random.normal(ks[2], (c,))
    wq = 0.03*jax.random.normal(ks[3], (c, c))
    k = jax.random.normal(ks[4], (bt//t, skv, c), jnp.bfloat16)
    v = jax.random.normal(ks[5], (bt//t, skv, c), jnp.bfloat16)
    wo = 0.03*jax.random.normal(ks[6], (c, c)); bo = 0.1*jax.random.normal(ks[7], (c,))
    fused = jax.jit(lambda x: x + fused_cross_attention_block(
        x, lns, lnb, wq, k, v, wo, bo, heads=heads, dim_head=d, t_repeat=t, use_pallas=True))
    def xla_chain(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True); var = jnp.mean(xf*xf, -1, keepdims=True) - mu*mu
        hn = ((xf-mu)*jax.lax.rsqrt(var+1e-5)*lns + lnb).astype(x.dtype)
        q = hn @ wq.astype(x.dtype)
        kr = jnp.repeat(k, t, axis=0); vr = jnp.repeat(v, t, axis=0)
        sp = lambda a: a.reshape(a.shape[0], a.shape[1], heads, d).transpose(0,2,1,3)
        o = attention_xla(sp(q), sp(kr), sp(vr), scale=d**-0.5)
        o = o.transpose(0,2,1,3).reshape(bt, s, c)
        return x + (o @ wo.astype(x.dtype) + bo.astype(x.dtype)).astype(x.dtype)
    xla = jax.jit(xla_chain)
    timed_chained(f"crossattn fused BT{bt} S{s} c{c}", fused, x)
    timed_chained(f"crossattn xla   BT{bt} S{s} c{c}", xla, x)

ca(16, 16384, 512)
ca(16, 4096, 512)
ca(16, 1024, 1024)
