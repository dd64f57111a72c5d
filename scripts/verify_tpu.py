"""On-hardware verification: run this on a TPU host to validate the kernels
and the flagship pipeline end to end (the CPU test suite cannot cover
compiled-Mosaic behavior).

    python scripts/verify_tpu.py            # kernels + tiny pipeline smoke
    python scripts/verify_tpu.py --full     # + full-size e2e at 256
"""

import argparse
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


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[ok]   {name} ({time.time() - t0:.1f}s)")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {name}: {type(e).__name__}: {e}")
        return False


def flash_attention_check():
    from upscale_a_video_tpu.ops.attention import attention_xla
    from upscale_a_video_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 1024, 128), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 1024, 128), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 1024, 128), jnp.bfloat16)
    want = np.asarray(attention_xla(q, k, v, 0.088), np.float32)
    got = np.asarray(flash_attention(q, k, v, 0.088), np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2)


def fused_gn_check():
    import flax.linen as nn

    from upscale_a_video_tpu.ops.fused_groupnorm import fused_group_norm

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 256), jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    got = np.asarray(fused_group_norm(x, scale, bias, 32, act="silu",
                                      use_pallas=True), np.float32)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    want = np.asarray(jax.nn.silu(
        gn.apply({"params": {"scale": scale, "bias": bias}}, x)), np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2)


def fused_temporal_resblock_check():
    from upscale_a_video_tpu.ops.fused_temporal_resblock import (
        fused_temporal_resblock,
    )

    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 8)
    b, t, h, w, c = 2, 8, 32, 32, 256
    x = jax.random.normal(ks[0], (b, t, h, w, c), jnp.bfloat16)
    args = (
        x,
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        0.02 * jax.random.normal(ks[1], (5, 1, 1, c, c), jnp.float32),
        jnp.zeros((c,), jnp.float32),
        0.1 * jax.random.normal(ks[2], (b, c), jnp.float32),
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        0.02 * jax.random.normal(ks[3], (3, 1, 1, c, c), jnp.float32),
        jnp.zeros((c,), jnp.float32),
    )
    got = np.asarray(fused_temporal_resblock(*args, groups=32,
                                             use_pallas=True), np.float32)
    want = np.asarray(fused_temporal_resblock(*args, groups=32,
                                              use_pallas=False), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2)


def fused_cross_attention_check():
    from upscale_a_video_tpu.ops.cross_attention_block import (
        fused_cross_attention_block,
    )

    ks = jax.random.split(jax.random.PRNGKey(5), 8)
    bt, s, c, hd, d, skv = 16, 1024, 512, 8, 64, 77
    args = (
        jax.random.normal(ks[0], (bt, s, c), jnp.bfloat16),
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        0.05 * jax.random.normal(ks[1], (c, hd * d), jnp.float32),
        jax.random.normal(ks[2], (1, skv, hd * d), jnp.bfloat16),
        jax.random.normal(ks[3], (1, skv, hd * d), jnp.bfloat16),
        0.05 * jax.random.normal(ks[4], (hd * d, c), jnp.float32),
        jnp.zeros((c,), jnp.float32),
    )
    kw = dict(heads=hd, dim_head=d, t_repeat=16)
    got = np.asarray(fused_cross_attention_block(*args, use_pallas=True, **kw),
                     np.float32)
    want = np.asarray(fused_cross_attention_block(*args, use_pallas=False, **kw),
                      np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2)
    # residual folded in-kernel == x + delta
    got_r = np.asarray(fused_cross_attention_block(
        *args, use_pallas=True, add_residual=True, **kw), np.float32)
    np.testing.assert_allclose(got_r, np.asarray(args[0], np.float32) + got,
                               atol=5e-2)


def fused_feedforward_check():
    from upscale_a_video_tpu.ops.fused_feedforward import fused_feedforward

    ks = jax.random.split(jax.random.PRNGKey(6), 6)
    bt, s, c = 16, 1024, 512
    args = (
        jax.random.normal(ks[0], (bt, s, c), jnp.bfloat16),
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        0.02 * jax.random.normal(ks[1], (c, 8 * c), jnp.float32),
        jnp.zeros((8 * c,), jnp.float32),
        0.02 * jax.random.normal(ks[2], (4 * c, c), jnp.float32),
        jnp.zeros((c,), jnp.float32),
    )
    got = np.asarray(fused_feedforward(*args, use_pallas=True), np.float32)
    want = np.asarray(fused_feedforward(*args, use_pallas=False), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2)
    got_r = np.asarray(fused_feedforward(*args, use_pallas=True,
                                         add_residual=True), np.float32)
    np.testing.assert_allclose(got_r, np.asarray(args[0], np.float32) + got,
                               atol=5e-2)


def fused_temporal_attention_block_check():
    from upscale_a_video_tpu.ops.temporal_attention_block import (
        fused_temporal_attention_block,
    )

    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    t, s, c, heads = 8, 256, 512, 8
    args = (
        jax.random.normal(ks[0], (2 * t, s, c), jnp.bfloat16),
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        0.05 * jax.random.normal(ks[1], (c, c), jnp.float32),
        0.05 * jax.random.normal(ks[2], (c, c), jnp.float32),
        0.05 * jax.random.normal(ks[3], (c, c), jnp.float32),
        0.05 * jax.random.normal(ks[4], (c, c), jnp.float32),
        jnp.zeros((c,), jnp.float32),
        0.1 * jax.random.normal(ks[5], (heads, t, t), jnp.float32),
    )
    got = np.asarray(fused_temporal_attention_block(
        *args, video_length=t, use_pallas=True), np.float32)
    want = np.asarray(fused_temporal_attention_block(
        *args, video_length=t, use_pallas=False), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2)
    got_r = np.asarray(fused_temporal_attention_block(
        *args, video_length=t, use_pallas=True, add_residual=True),
        np.float32)
    np.testing.assert_allclose(got_r, np.asarray(args[0], np.float32) + got,
                               atol=5e-2)


def flagship_forward_check():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    val = np.asarray(out[(0,) * out.ndim], np.float32)
    assert np.isfinite(val).all()


def full_e2e_check():
    import subprocess

    r = subprocess.run([sys.executable, "-u", "bench.py", "--stage", "e2e", "256"],
                       capture_output=True, text=True, timeout=900)
    print(r.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    assert jax.devices()[0].platform == "tpu", "run on a TPU host"
    ok = True
    ok &= check("pallas flash attention vs XLA", flash_attention_check)
    ok &= check("pallas fused groupnorm vs flax", fused_gn_check)
    ok &= check("pallas fused temporal resblock vs reference",
                fused_temporal_resblock_check)
    ok &= check("pallas fused cross-attention block vs reference",
                fused_cross_attention_check)
    ok &= check("pallas fused LN+GEGLU feedforward vs reference",
                fused_feedforward_check)
    ok &= check("pallas fused temporal-attention block vs reference",
                fused_temporal_attention_block_check)
    ok &= check("flagship UNet forward", flagship_forward_check)
    if args.full:
        ok &= check("full e2e bench @256", full_e2e_check)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
