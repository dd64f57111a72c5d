"""On-chip probe: what precision do f32 matmuls/attention actually deliver?

Motivates the bf16-operand default for the fp32 decode's mid attention
(nn/attention.py SpatialAttentionBlock): at JAX's DEFAULT precision the TPU
MXU truncates f32 matmul operands to bf16 per pass, so "f32" attention is
already bf16-class accuracy — f32 operand storage only adds HBM traffic.
Multi-pass f32 emulation (precision=HIGH/HIGHEST) exists for plain XLA dots
but is NOT supported inside Mosaic/Pallas kernels (the flash kernel), so a
strict-f32 flash path is not available; the honest options are documented
operand storage (bf16 vs f32) with f32 softmax/accumulation in both.

Measured on the round-3 chip (v5e via axon):

    XLA dot f32 8192x512x8192:
        highest 3.81 ms   rel_err 0
        high    2.72 ms   rel_err 1.4e-5   (bf16_3x)
        default 2.06 ms   rel_err 2.5e-3   (single-pass bf16)
    flash kernel (b,h,s,d)=(1,1,2048,512) vs f64 reference:
        f32 operands  rel_err 4.6e-3
        bf16 operands rel_err 5.1e-3

Run: python scripts/attn_precision.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def probe_dot():
    m = n = 8192
    k = 512
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    ref = None
    for prec in ("highest", "high", "default"):
        f = jax.jit(lambda x, y, p=prec: jnp.dot(x, y, precision=p))
        o = f(a, b)
        np.asarray(o[0, 0])
        t0 = time.time()
        for _ in range(20):
            o = f(a, b)
        np.asarray(o[0, 0])
        dt = (time.time() - t0) / 20
        on = np.asarray(o)
        if ref is None:
            ref = on
        err = np.abs(on - ref).max() / np.abs(ref).max()
        print(f"dot f32 {prec:9s}: {dt * 1000:7.2f} ms  rel_err={err:.2e}")


def probe_flash():
    from upscale_a_video_tpu.ops.flash_attention import flash_attention

    b, h, s, d = 1, 1, 2048, 512
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    scale = 1 / np.sqrt(d)
    qn, kn, vn = (np.asarray(a).astype(np.float64) for a in (q, k, v))
    sc = (qn[0, 0] @ kn[0, 0].T) * scale
    sc -= sc.max(-1, keepdims=True)
    p = np.exp(sc)
    p /= p.sum(-1, keepdims=True)
    ref = p @ vn[0, 0]
    for name, args in (
        ("f32 ", (q, k, v)),
        ("bf16", tuple(a.astype(jnp.bfloat16) for a in (q, k, v))),
    ):
        o = np.asarray(flash_attention(*args, scale)).astype(np.float64)
        err = np.abs(o[0, 0] - ref).max() / np.abs(ref).max()
        print(f"flash {name} operands: rel_err vs f64 = {err:.2e}")


if __name__ == "__main__":
    probe_dot()
    probe_flash()
