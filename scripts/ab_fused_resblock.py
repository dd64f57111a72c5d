"""A/B the fused temporal resblock kernel vs the XLA chain at UNet shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.ops.fused_temporal_resblock import (
    fused_temporal_resblock, fused_temporal_resblock_reference)

from _timing import timed_chained


def timed(name, fn, x, *rest):
    # CHAINED: the resblock maps x -> same shape; unchained rep loops can
    # report impossibly fast times through the axon tunnel (_timing.py)
    timed_chained(name, lambda cur: fn(cur, *rest), x)
    return fn(x, *rest)


def run(b, t, hw, c, k1, groups=32, temb=True):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (b, t, hw, hw, c), jnp.bfloat16)
    n1s = jnp.ones((c,)) + 0.1 * jax.random.normal(ks[1], (c,))
    n1b = 0.1 * jax.random.normal(ks[2], (c,))
    w1 = 0.05 * jax.random.normal(ks[3], (k1, 1, 1, c, c))
    b1 = 0.1 * jax.random.normal(ks[4], (c,))
    tp = 0.1 * jax.random.normal(ks[5], (b, c)) if temb else None
    n2s = jnp.ones((c,)) + 0.1 * jax.random.normal(ks[6], (c,))
    n2b = 0.1 * jax.random.normal(ks[7], (c,))
    w2 = 0.05 * jax.random.normal(ks[8], (3, 1, 1, c, c))
    b2 = 0.1 * jax.random.normal(ks[9], (c,))

    args = (x, n1s, n1b, w1, b1, tp, n2s, n2b, w2, b2)

    fused = jax.jit(lambda *a: fused_temporal_resblock(
        *a, groups=groups, use_pallas=True))
    ref = jax.jit(lambda *a: fused_temporal_resblock_reference(
        *a, groups=groups, eps=1e-6, dtype=jnp.bfloat16))

    got = timed(f"fused  B{b} T{t} {hw}² c{c} k{k1}", fused, *args)
    want = timed(f"xla    B{b} T{t} {hw}² c{c} k{k1}", ref, *args)
    g32 = np.asarray(got, np.float32)
    w32 = np.asarray(want, np.float32)
    scale = np.abs(w32).max()
    print(f"  maxdiff {np.abs(g32 - w32).max():.4f} "
          f"(rel {np.abs(g32 - w32).max() / scale:.5f}, scale {scale:.1f})")


if __name__ == "__main__":
    run(2, 8, 256, 256, 5)          # L0 TemporalModule
    run(2, 8, 128, 512, 5)          # L1 TemporalModule
    run(2, 8, 128, 512, 3, temb=False)  # L1 Transformer3D resblock
    run(2, 8, 64, 512, 5)           # L2
