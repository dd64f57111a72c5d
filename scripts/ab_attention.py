"""A/B at 20 reps: temporal attention fused-kernel vs packed-XLA vs plain-XLA,
and cross attention flash vs XLA, at the L1 (128², c512) shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.ops.attention import (
    attention_packed_small,
    attention_xla,
)
from upscale_a_video_tpu.ops.flash_attention import flash_attention
from upscale_a_video_tpu.ops.fused_temporal_attention import (
    _reference,
    fused_temporal_attention,
)

REPS = 20


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    print(f"{name:52s} {(time.time() - t0) / REPS * 1e3:8.2f} ms", flush=True)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    B, S, H, D = 32768, 8, 8, 64

    qt = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    kt = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    vt = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (H, S, S), jnp.float32)
    timed("temporal fused pallas",
          jax.jit(lambda q, k, v: fused_temporal_attention(q, k, v, bias,
                                                           use_pallas=True)),
          qt, kt, vt)
    timed("temporal packed XLA ref",
          jax.jit(lambda q, k, v: _reference(q, k, v, bias)), qt, kt, vt)
    qb = qt.transpose(0, 2, 1, 3)
    kb = kt.transpose(0, 2, 1, 3)
    vb = vt.transpose(0, 2, 1, 3)
    timed("temporal packed-small (BHSD)",
          jax.jit(lambda q, k, v: attention_packed_small(q, k, v, 1.0,
                                                         bias[None])),
          qb, kb, vb)
    timed("temporal plain XLA (BHSD)",
          jax.jit(lambda q, k, v: attention_xla(q, k, v, 1.0, bias[None])),
          qb, kb, vb)

    # cross attention (BT·H flattened, 16384 q, 77 kv)
    qc = jax.random.normal(ks[4], (16, 8, 16384, 64), jnp.bfloat16)
    kc = jax.random.normal(ks[5], (16, 8, 77, 64), jnp.bfloat16)
    vc = jax.random.normal(ks[6], (16, 8, 77, 64), jnp.bfloat16)
    timed("cross flash (pad d=64->128, short kv)",
          jax.jit(lambda q, k, v: flash_attention(q, k, v, 0.125)), qc, kc, vc)
    timed("cross XLA", jax.jit(lambda q, k, v: attention_xla(q, k, v, 0.125)),
          qc, kc, vc)


if __name__ == "__main__":
    main()
