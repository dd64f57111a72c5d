"""Fused temporal-attention block: reference math == module chain, param-tree
invariance under the fused branch, gradients. (The Pallas kernel itself runs
on TPU; scripts/verify_tpu.py + the e2e bench cover it there.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.nn.attention import BasicTransformerBlock
from upscale_a_video_tpu.ops.temporal_attention_block import (
    _reference,
    fused_temporal_attention_block,
    temporal_attention_block_fits,
)

BT, S, C, T = 8, 64, 128, 4
HEADS, D = 2, 64


@pytest.mark.slow
def test_reference_matches_module_chain():
    """_reference == the module path (transpose → LN → TemporalAttention →
    transpose back) with identical weights."""
    import flax.linen as nn

    from upscale_a_video_tpu.nn.attention import TemporalAttention

    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x = jax.random.normal(ks[0], (BT, S, C))
    lns = 1 + 0.1 * jax.random.normal(ks[1], (C,))
    lnb = 0.1 * jax.random.normal(ks[2], (C,))
    wq = 0.1 * jax.random.normal(ks[3], (C, C))
    wk = 0.1 * jax.random.normal(ks[4], (C, C))
    wv = 0.1 * jax.random.normal(ks[5], (C, C))
    wo = 0.1 * jax.random.normal(ks[6], (C, C))
    bo = 0.1 * jax.random.normal(ks[7], (C,))
    bias_table = jax.random.normal(ks[8], (32, HEADS))

    from upscale_a_video_tpu.ops.relpos import relative_position_buckets

    buckets = relative_position_buckets(T, 32, 32)
    bias_hss = bias_table[jnp.asarray(buckets)].transpose(2, 0, 1)

    got = _reference(x, lns, lnb, wq, wk, wv, wo, bo, bias_hss, T, 32, 1e-5)

    # module chain
    b = BT // T
    xt = x.reshape(b, T, S, C).transpose(0, 2, 1, 3).reshape(b * S, T, C)
    h = nn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": lns, "bias": lnb}}, xt)
    attn = TemporalAttention(query_dim=C, heads=HEADS, dim_head=D)
    variables = {"params": {
        "to_q": {"kernel": wq}, "to_k": {"kernel": wk}, "to_v": {"kernel": wv},
        "relative_attention_bias": bias_table,
        "to_out_0": {"kernel": wo, "bias": bo},
    }}
    dt_ = attn.apply(variables, h)
    want = dt_.reshape(b, S, T, C).transpose(0, 2, 1, 3).reshape(BT, S, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_fits_gate():
    assert temporal_attention_block_fits((16, 16384, 512), 8, 8)
    assert temporal_attention_block_fits((16, 1024, 1024), 8, 8)
    assert temporal_attention_block_fits((8, 64, 128), 4, 2)
    assert not temporal_attention_block_fits((16, 16384, 512), 7, 8)  # 128%T
    assert not temporal_attention_block_fits((16, 16384, 192), 8, 8)  # C%128
    assert not temporal_attention_block_fits((16, 16384, 512), 8, 16)  # D%64


@pytest.mark.slow
def test_block_fused_temporal_tree_and_output(monkeypatch):
    """Forced fused branch on CPU (reference math inside): identical param
    tree + matching outputs vs the unfused module path."""
    blk = BasicTransformerBlock(dim=C, heads=HEADS, dim_head=D,
                                cross_attention_dim=96,
                                only_cross_attention=False,
                                dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (BT, S, C))
    clip = jax.random.normal(jax.random.PRNGKey(2), (BT // T, 11, 96))
    ctx = jnp.repeat(clip, T, axis=0)

    for f in ("UAV_FORCE_FUSED_CROSS", "UAV_FORCE_FUSED_TEMPORAL",
              "UAV_FORCE_FUSED_FF"):
        monkeypatch.delenv(f, raising=False)
    v_plain = blk.init(jax.random.PRNGKey(3), x, ctx, T)
    out_plain = blk.apply(v_plain, x, ctx, T)

    for f in ("UAV_FORCE_FUSED_CROSS", "UAV_FORCE_FUSED_TEMPORAL",
              "UAV_FORCE_FUSED_FF"):
        monkeypatch.setenv(f, "1")
    v_fused = blk.init(jax.random.PRNGKey(3), x, ctx, T)
    out_fused = blk.apply(v_fused, x, ctx, T)

    assert (jax.tree_util.tree_structure(v_plain)
            == jax.tree_util.tree_structure(v_fused))
    for a, b in zip(jax.tree.leaves(v_plain), jax.tree.leaves(v_fused)):
        assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.slow
def test_block_fused_temporal_gradients(monkeypatch):
    monkeypatch.setenv("UAV_FORCE_FUSED_TEMPORAL", "1")
    monkeypatch.setenv("UAV_FORCE_FUSED_FF", "1")
    blk = BasicTransformerBlock(dim=C, heads=HEADS, dim_head=D,
                                cross_attention_dim=None,
                                only_cross_attention=False,
                                dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (BT, S, C))
    v = blk.init(jax.random.PRNGKey(3), x, None, T)

    def loss(v, x):
        return jnp.sum(jnp.square(blk.apply(v, x, None, T)))

    gf = jax.grad(loss)(v, x)
    monkeypatch.setenv("UAV_NO_FUSED_TEMPORAL", "1")
    gp = jax.grad(loss)(v, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_add_residual_folds_exactly():
    import numpy as _np
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 9)
    bt, s, c, t, heads = 8, 32, 128, 4, 2
    x = jax.random.normal(ks[0], (bt, s, c), jnp.float32)
    args = (1 + 0.1 * jax.random.normal(ks[1], (c,)),
            0.1 * jax.random.normal(ks[2], (c,)),
            0.1 * jax.random.normal(ks[3], (c, c)),
            0.1 * jax.random.normal(ks[4], (c, c)),
            0.1 * jax.random.normal(ks[5], (c, c)),
            0.1 * jax.random.normal(ks[6], (c, c)),
            0.1 * jax.random.normal(ks[7], (c,)),
            0.1 * jax.random.normal(ks[8], (heads, t, t)))
    delta = fused_temporal_attention_block(x, *args, video_length=t,
                                           use_pallas=False)
    fused = fused_temporal_attention_block(x, *args, video_length=t,
                                           use_pallas=False,
                                           add_residual=True)
    _np.testing.assert_allclose(_np.asarray(fused), _np.asarray(x + delta),
                                atol=1e-5)
