"""LoRA adapters (ref llava/train/train.py lora_enable / PEFT semantics):
identity at init, adapter-only training reduces loss, merge == apply."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from upscale_a_video_tpu.models.llava.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    causal_prefill_mask,
)
from upscale_a_video_tpu.training.lora import (
    apply_lora,
    init_lora,
    make_lora_train_step,
    merge_lora,
    num_lora_params,
)

CFG = LlamaConfig(vocab_size=50, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  max_position_embeddings=16)


def _model_and_params():
    model = LlamaForCausalLM(CFG)

    def fwd(mdl, ids):
        emb = mdl.embed(ids)
        return mdl(emb, jnp.arange(ids.shape[1]), None, 0,
                   causal_prefill_mask(ids.shape[1], ids.shape[1]))[0]

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6), jnp.int32),
                        method=fwd)
    return model, params, fwd


def test_lora_targets_projections_only():
    _, params, _ = _model_and_params()
    lora = init_lora(params["params"], rank=4)
    paths = ["/".join(p) for p, _ in _flat(lora)]
    assert any("q_proj" in p for p in paths)
    assert any("down_proj" in p for p in paths)
    # embeddings / norms / lm_head are not adapted by the default rule
    assert not any("embed" in p or "norm" in p.lower() for p in paths)
    assert num_lora_params(lora) > 0


def _flat(lora, path=()):
    if isinstance(lora, dict) and set(lora) == {"a", "b"}:
        yield path, lora
    elif isinstance(lora, dict):
        for k, v in lora.items():
            yield from _flat(v, path + (k,))


def test_lora_identity_at_init():
    """B=0 ⇒ adapted forward == base forward exactly."""
    model, params, fwd = _model_and_params()
    lora = init_lora(params["params"], rank=4)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 50, (1, 6)))
    base = model.apply(params, ids, method=fwd)
    adapted = model.apply({"params": apply_lora(params["params"], lora)},
                          ids, method=fwd)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(adapted))


def test_lora_training_reduces_loss_and_freezes_base():
    model, params, fwd = _model_and_params()
    base = params["params"]
    lora = init_lora(base, rank=4, seed=1)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 50, (2, 6)))
    labels = jnp.asarray(np.random.RandomState(2).randint(0, 50, (2, 6)))

    def loss_fn(p, batch, key):
        logits = model.apply({"params": p}, batch["ids"], method=fwd)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["labels"]).mean()

    opt = optax.adam(1e-2)
    step = jax.jit(make_lora_train_step(loss_fn, opt))
    opt_state = opt.init(lora)
    batch = {"ids": ids, "labels": labels}
    losses = []
    for i in range(12):
        lora, opt_state, loss = step(base, lora, opt_state, batch,
                                     jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.05
    # the base tree was never touched
    np.testing.assert_array_equal(
        np.asarray(base["model"]["layers_0"]["self_attn_q_proj"]["kernel"]),
        np.asarray(params["params"]["model"]["layers_0"]
                   ["self_attn_q_proj"]["kernel"]))


def test_merge_equals_apply():
    model, params, fwd = _model_and_params()
    lora = init_lora(params["params"], rank=4, seed=3)
    # give B nonzero values so the adapters actually do something
    lora = jax.tree_util.tree_map(lambda x: x + 0.01, lora)
    ids = jnp.asarray(np.random.RandomState(4).randint(0, 50, (1, 6)))
    a = model.apply({"params": apply_lora(params["params"], lora)},
                    ids, method=fwd)
    merged = merge_lora(params["params"], lora)
    b = model.apply({"params": merged}, ids, method=fwd)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    base = model.apply(params, ids, method=fwd)
    assert not np.allclose(np.asarray(a), np.asarray(base))


def test_lora_on_mpt_fused_wqkv():
    """The default target rule also adapts MPT's fused Wqkv projection."""
    from upscale_a_video_tpu.models.llava.mpt import MPTConfig, MPTForCausalLM

    cfg = MPTConfig(vocab_size=40, d_model=32, n_layers=1, n_heads=4,
                    expansion_ratio=2, max_seq_len=8)
    model = MPTForCausalLM(cfg)

    def fwd(mdl, ids):
        emb = mdl.embed(ids)
        return mdl(emb, jnp.arange(ids.shape[1]), None, 0,
                   causal_prefill_mask(ids.shape[1], ids.shape[1]))[0]

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                        method=fwd)
    lora = init_lora(params["params"], rank=2)
    paths = ["/".join(p) for p, _ in _flat(lora)]
    assert any("Wqkv" in p for p in paths)
