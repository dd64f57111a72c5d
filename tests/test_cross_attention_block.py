"""Fused cross-attention block: math parity, module-tree invariance, grads.

The Pallas kernel itself runs on TPU only (scripts/verify_tpu.py covers it);
on CPU we verify the M/Vo-form reference math against the plain
LN+CrossAttention module chain, and that routing BasicTransformerBlock
through the fused branch leaves the param tree and outputs unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.nn.attention import BasicTransformerBlock
from upscale_a_video_tpu.ops.cross_attention_block import (
    cross_attention_block_fits,
    fused_cross_attention_block,
)

BT, S, C, T, SKV = 8, 64, 128, 4, 11
HEADS, D = 8, 16


def _args(key):
    ks = jax.random.split(key, 9)
    return dict(
        x=jax.random.normal(ks[0], (BT, S, C), jnp.float32),
        ln_scale=1 + 0.1 * jax.random.normal(ks[1], (C,)),
        ln_bias=0.1 * jax.random.normal(ks[2], (C,)),
        wq=0.1 * jax.random.normal(ks[3], (C, C)),
        k=jax.random.normal(ks[4], (BT // T, SKV, C)),
        v=jax.random.normal(ks[5], (BT // T, SKV, C)),
        wo=0.1 * jax.random.normal(ks[6], (C, C)),
        bo=0.1 * jax.random.normal(ks[7], (C,)),
    )


def test_reference_matches_manual_attention():
    a = _args(jax.random.PRNGKey(0))
    got = fused_cross_attention_block(
        a["x"], a["ln_scale"], a["ln_bias"], a["wq"], a["k"], a["v"],
        a["wo"], a["bo"], heads=HEADS, dim_head=D, t_repeat=T,
        use_pallas=False)

    # manual: LN -> q proj -> per-head softmax(qk^T·scale) v -> out proj
    xf = a["x"].astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    hn = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * a["ln_scale"] + a["ln_bias"]
    q = hn @ a["wq"]
    kr = jnp.repeat(a["k"], T, axis=0)
    vr = jnp.repeat(a["v"], T, axis=0)

    def split(t):
        return t.reshape(t.shape[0], t.shape[1], HEADS, D).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(kr), split(vr)
    scores = jnp.einsum("bhsd,bhkd->bhsk", qh, kh) * (D ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhsk,bhkd->bshd", probs, vh).reshape(BT, S, C)
    want = out @ a["wo"] + a["bo"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_fits_gate():
    assert cross_attention_block_fits((16, 16384, 512), 77, 8, 64)
    assert not cross_attention_block_fits((16, 1024, 1024), 77, 8, 128)  # c
    assert not cross_attention_block_fits((16, 1024, 512), 256, 8, 64)  # skv
    assert not cross_attention_block_fits((16, 1024, 192), 77, 8, 24)   # c%128


def _tiny_block(only_cross=True):
    return BasicTransformerBlock(dim=C, heads=HEADS, dim_head=D,
                                 cross_attention_dim=96,
                                 only_cross_attention=only_cross,
                                 dtype=jnp.float32)


def _repeated_ctx(key):
    """Per-clip context repeated per frame — the layout Transformer3DModel
    feeds BasicTransformerBlock (the fused path relies on it)."""
    clip = jax.random.normal(key, (BT // T, SKV, 96))
    return jnp.repeat(clip, T, axis=0)


@pytest.mark.parametrize("only_cross", [True, False])
@pytest.mark.slow
def test_block_fused_branch_tree_and_output(monkeypatch, only_cross):
    """Forcing the fused branch on CPU (reference math inside): identical
    param tree + matching outputs vs the unfused module path."""
    blk = _tiny_block(only_cross)
    x = jax.random.normal(jax.random.PRNGKey(1), (BT, S, C))
    ctx = _repeated_ctx(jax.random.PRNGKey(2))

    monkeypatch.delenv("UAV_FORCE_FUSED_CROSS", raising=False)
    v_plain = blk.init(jax.random.PRNGKey(3), x, ctx, T)
    out_plain = blk.apply(v_plain, x, ctx, T)

    monkeypatch.setenv("UAV_FORCE_FUSED_CROSS", "1")
    v_fused = blk.init(jax.random.PRNGKey(3), x, ctx, T)
    out_fused = blk.apply(v_fused, x, ctx, T)

    assert (jax.tree_util.tree_structure(v_plain)
            == jax.tree_util.tree_structure(v_fused))
    for a, b in zip(jax.tree.leaves(v_plain), jax.tree.leaves(v_fused)):
        assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.slow
def test_block_fused_gradients(monkeypatch):
    monkeypatch.setenv("UAV_FORCE_FUSED_CROSS", "1")
    blk = _tiny_block(True)
    x = jax.random.normal(jax.random.PRNGKey(1), (BT, S, C))
    ctx = _repeated_ctx(jax.random.PRNGKey(2))
    v = blk.init(jax.random.PRNGKey(3), x, ctx, T)

    def loss(v, x):
        return jnp.sum(jnp.square(blk.apply(v, x, ctx, T)))

    gf = jax.grad(loss)(v, x)
    monkeypatch.setenv("UAV_NO_FUSED_CROSS", "1")
    gp = jax.grad(loss)(v, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_add_residual_folds_exactly():
    a = _args(jax.random.PRNGKey(7))
    kw = dict(heads=HEADS, dim_head=D, t_repeat=T, use_pallas=False)
    delta = fused_cross_attention_block(
        a["x"], a["ln_scale"], a["ln_bias"], a["wq"], a["k"], a["v"],
        a["wo"], a["bo"], **kw)
    fused = fused_cross_attention_block(
        a["x"], a["ln_scale"], a["ln_bias"], a["wq"], a["k"], a["v"],
        a["wo"], a["bo"], add_residual=True, **kw)
    np.testing.assert_allclose(np.asarray(fused),
                               np.asarray(a["x"] + delta), atol=1e-5)


def test_ff_add_residual_folds_exactly():
    from upscale_a_video_tpu.ops.fused_feedforward import fused_feedforward

    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 7)
    bt, s, c = 4, 32, 128
    x = jax.random.normal(ks[0], (bt, s, c), jnp.float32)
    args = (1 + 0.1 * jax.random.normal(ks[1], (c,)),
            0.1 * jax.random.normal(ks[2], (c,)),
            0.1 * jax.random.normal(ks[3], (c, 8 * c)),
            0.1 * jax.random.normal(ks[4], (8 * c,)),
            0.1 * jax.random.normal(ks[5], (4 * c, c)),
            0.1 * jax.random.normal(ks[6], (c,)))
    delta = fused_feedforward(x, *args, use_pallas=False)
    fused = fused_feedforward(x, *args, use_pallas=False, add_residual=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(x + delta),
                               atol=1e-5)


def test_vae_mid_attn_bf16_gate(monkeypatch):
    """The fp32 VAE mid attention defaults to bf16 q/k/v operand storage
    (the MXU truncates f32 matmul operands to bf16 per pass at default
    precision anyway — same accuracy class, half the operand traffic;
    scripts/attn_precision.py). UAV_VAE_ATTN_F32 restores f32 operand
    storage; output dtype is fp32 and close on both paths."""
    import os

    from upscale_a_video_tpu.nn.attention import SpatialAttentionBlock

    blk = SpatialAttentionBlock(channels=128, norm_num_groups=4,
                                dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, 128),
                          jnp.float32)
    params = blk.init(jax.random.PRNGKey(4), x)
    assert not os.environ.get("UAV_VAE_ATTN_F32")
    fast = blk.apply(params, x)  # default: bf16 operands
    monkeypatch.setenv("UAV_VAE_ATTN_F32", "1")
    strict = blk.apply(params, x)
    assert fast.dtype == jnp.float32 and strict.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(fast), np.asarray(strict),
                               atol=3e-2)
    assert not np.array_equal(np.asarray(fast), np.asarray(strict))
