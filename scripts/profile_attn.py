"""Sub-module timing for the L1 transformer (128², c512, only_cross) shapes:
which of cross-attn / temporal-attn / FF / norms / reshapes eats the 97 ms."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.nn.attention import CrossAttention, TemporalAttention

B, T, HW, C = 2, 8, 128 * 128, 512
HEADS, DH = 8, 64
DT = jnp.bfloat16


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    print(f"{name:50s} {(time.time() - t0) / reps * 1e3:8.1f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x_sp = jax.random.normal(key, (B * T, HW, C), DT)       # spatial tokens
    ctx = jax.random.normal(key, (B * T, 77, 1024), DT)
    x_tm = jax.random.normal(key, (B * HW, T, C), DT)       # temporal tokens

    ca = CrossAttention(query_dim=C, cross_attention_dim=1024, heads=HEADS,
                        dim_head=DH, dtype=DT)
    pa = ca.init(jax.random.PRNGKey(1), x_sp, ctx)
    timed("cross attention (BT,16384,512)x(77 ctx)",
          jax.jit(lambda p, x, c: ca.apply(p, x, c)), pa, x_sp, ctx)

    ta = TemporalAttention(query_dim=C, heads=HEADS, dim_head=DH, dtype=DT)
    pt = ta.init(jax.random.PRNGKey(2), x_tm)
    timed("temporal attention (B*16384,8,512)",
          jax.jit(lambda p, x: ta.apply(p, x)), pt, x_tm)

    ln = nn.LayerNorm(epsilon=1e-5, dtype=DT)
    pl_ = ln.init(jax.random.PRNGKey(3), x_sp)
    timed("layernorm (BT,16384,512)", jax.jit(lambda p, x: ln.apply(p, x)),
          pl_, x_sp)

    dense1 = nn.Dense(C * 8, dtype=DT)  # geglu up
    pd = dense1.init(jax.random.PRNGKey(4), x_sp)
    timed("FF up-proj 512->4096", jax.jit(lambda p, x: dense1.apply(p, x)),
          pd, x_sp)

    def transpose_roundtrip(x):
        y = x.reshape(B, T, HW, C).transpose(0, 2, 1, 3).reshape(B * HW, T, C)
        return y.reshape(B, HW, T, C).transpose(0, 2, 1, 3).reshape(B * T, HW, C)

    timed("spatial<->temporal transpose roundtrip",
          jax.jit(transpose_roundtrip), x_sp)

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=DT)
    xg = x_sp.reshape(B * T, 128, 128, C)
    pg = gn.init(jax.random.PRNGKey(5), xg)
    timed("groupnorm (BT,128,128,512)", jax.jit(lambda p, x: gn.apply(p, x)),
          pg, xg)


if __name__ == "__main__":
    main()
