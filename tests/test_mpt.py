"""MPT decoder (the reference's alternative LLaVA language model —
llava/model/language_model/mpt/) vs HF transformers MptForCausalLM: prefill
logits, KV-cache decode steps, and the converter key mapping. Plus unit
checks for the options HF does not expose (qk_ln, learned positions,
clip_qkv, multiquery)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.models.llava.convert import convert_mpt
from upscale_a_video_tpu.models.llava.llama import (
    causal_prefill_mask,
    decode_step_mask,
)
from upscale_a_video_tpu.models.llava.mpt import (
    MPTConfig,
    MPTForCausalLM,
    alibi_key_bias,
    alibi_slopes,
)

CFG = MPTConfig(vocab_size=100, d_model=32, n_layers=2, n_heads=4,
                expansion_ratio=2, max_seq_len=16)


def _init_params(cfg: MPTConfig, max_len: int = 16, batch: int = 1):
    model = MPTForCausalLM(cfg)
    hkv = 1 if cfg.multiquery else cfg.n_heads
    kv0 = jnp.zeros((cfg.n_layers, 2, batch, hkv, max_len, cfg.head_dim))

    def init_fn(mdl, ids):
        emb = mdl.embed(ids)
        return mdl(emb, jnp.arange(ids.shape[1]), kv0,
                   0, causal_prefill_mask(ids.shape[1], max_len))

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((batch, 4), jnp.int32), method=init_fn)
    return model, params, kv0


def _hf_model_and_state(seed: int = 0):
    import torch
    import transformers

    torch.manual_seed(seed)
    t_cfg = transformers.MptConfig(
        d_model=32, n_heads=4, n_layers=2, expansion_ratio=2,
        max_seq_len=16, vocab_size=100)
    t_model = transformers.MptForCausalLM(t_cfg)
    t_model.eval()
    sd = {k: v.detach().float().numpy()
          for k, v in t_model.state_dict().items()}
    return t_model, sd


def test_mpt_prefill_logits_match_transformers():
    import torch

    t_model, sd = _hf_model_and_state()
    # HF's MptMLP hardcodes the 4× expansion (reference MPTMLP honors
    # expansion_ratio, blocks.py:10-18) — align for the parity check
    model, params, kv0 = _init_params(
        MPTConfig(**{**CFG.__dict__, "expansion_ratio": 4}))
    converted, report = convert_mpt(params["params"], sd, strict=True)
    assert report["unused"] == ["lm_head.weight"]  # tied to wte

    ids = np.array([[3, 17, 42, 99, 5, 0]], np.int32)
    with torch.no_grad():
        ref = t_model(torch.from_numpy(ids).long()).logits.numpy()

    s, max_len = ids.shape[1], 16

    def fwd(mdl, ids):
        emb = mdl.embed(ids)
        return mdl(emb, jnp.arange(s), kv0, 0,
                   causal_prefill_mask(s, max_len))

    logits, _ = model.apply({"params": converted}, jnp.asarray(ids),
                            method=fwd)
    np.testing.assert_allclose(np.asarray(logits)[:, :, :], ref,
                               rtol=2e-4, atol=2e-4)


def test_mpt_cached_decode_matches_full_forward():
    """Stepwise KV-cache decode must equal a full prefill over the same
    tokens (the generation path the captioner scans)."""
    model, params, kv0 = _init_params(CFG)
    ids = np.array([[7, 3, 11, 2, 55, 8]], np.int32)
    s, max_len = ids.shape[1], 16

    def fwd(mdl, ids):
        emb = mdl.embed(ids)
        return mdl(emb, jnp.arange(s), kv0, 0,
                   causal_prefill_mask(s, max_len))

    full_logits, _ = model.apply(params, jnp.asarray(ids), method=fwd)

    # prefill the first 3 tokens, then decode one token at a time
    def prefill3(mdl, ids):
        emb = mdl.embed(ids[:, :3])
        return mdl(emb, jnp.arange(3), kv0, 0,
                   causal_prefill_mask(3, max_len))

    logits, kv = model.apply(params, jnp.asarray(ids), method=prefill3)
    step_logits = [np.asarray(logits)[:, -1]]
    for i in range(3, s):
        def step(mdl, tok, kv, i=i):
            emb = mdl.embed(tok[:, None])
            return mdl(emb, jnp.asarray([i]), kv, i,
                       decode_step_mask(i, max_len))

        logits, kv = model.apply(params, jnp.asarray(ids[:, i]), kv,
                                 method=step)
        step_logits.append(np.asarray(logits)[:, -1])

    ref_last = np.asarray(full_logits)[0, 2:]
    got = np.concatenate(step_logits, axis=0)
    np.testing.assert_allclose(got, ref_last, rtol=1e-5, atol=1e-5)


def test_alibi_slopes_match_reference_schedule():
    """ref attention.py:283-292 gen_slopes, incl. the non-power-of-two
    interleave reorder."""
    s8 = np.asarray(alibi_slopes(8, 8))
    np.testing.assert_allclose(s8, [2.0 ** -i for i in range(1, 9)], rtol=1e-6)
    # n_heads=6 → slopes over 8, reordered [1::2] + [0::2], truncated
    s6 = np.asarray(alibi_slopes(6, 8))
    base = np.array([2.0 ** -i for i in range(1, 9)], np.float32)
    np.testing.assert_allclose(s6, np.concatenate([base[1::2], base[0::2]])[:6],
                               rtol=1e-6)


def test_alibi_key_bias_softmax_equivalent_to_two_sided():
    """The key-indexed (1,H,1,L) form differs from the explicit
    -slope·|i-j| bias only by per-row constants → identical softmax."""
    h, L = 4, 8
    key_bias = np.asarray(alibi_key_bias(h, L))[0]          # (H, 1, L)
    slopes = np.asarray(alibi_slopes(h))
    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    full = -slopes[:, None, None] * np.abs(i - j)[None]      # (H, L, L)
    causal = np.where(j <= i, 0.0, -np.inf)[None]
    a = jax.nn.softmax(jnp.asarray(key_bias + causal), axis=-1)
    b = jax.nn.softmax(jnp.asarray(full + causal), axis=-1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("opt", ["qk_ln", "clip_qkv", "learned_pos",
                                 "multiquery", "logit_scale"])
def test_mpt_option_paths_run_and_differ(opt):
    """Each config option changes the function (vs the base config) and
    produces finite logits — pins that the option is actually wired."""
    kwargs = dict(vocab_size=100, d_model=32, n_layers=2, n_heads=4,
                  expansion_ratio=2, max_seq_len=16)
    if opt == "qk_ln":
        kwargs["qk_ln"] = True
    elif opt == "clip_qkv":
        kwargs["clip_qkv"] = 0.05
    elif opt == "learned_pos":
        kwargs["alibi"] = False
    elif opt == "multiquery":
        kwargs["multiquery"] = True
    elif opt == "logit_scale":
        kwargs["logit_scale"] = 0.5
    cfg = MPTConfig(**kwargs)

    model, params, kv0 = _init_params(cfg)
    base_model, base_params, base_kv0 = _init_params(CFG)
    ids = jnp.asarray(np.array([[3, 1, 4, 1, 5, 9]], np.int32))
    s, max_len = 6, 16

    def fwd(mdl, ids, kv):
        emb = mdl.embed(ids)
        return mdl(emb, jnp.arange(s), kv, 0,
                   causal_prefill_mask(s, max_len))

    logits, kv = model.apply(params, ids, kv0, method=fwd)
    assert np.isfinite(np.asarray(logits)).all()
    if opt == "multiquery":
        assert kv.shape[3] == 1  # single shared KV head
        return
    if opt == "logit_scale":
        cfg_noscale = MPTConfig(**{**kwargs, "logit_scale": None})
        logits2, _ = MPTForCausalLM(cfg_noscale).apply(params, ids, kv0,
                                                       method=fwd)
        np.testing.assert_allclose(np.asarray(logits),
                                   0.5 * np.asarray(logits2), rtol=1e-6)
        return
    # same param shapes only for options that add no params
    if opt == "clip_qkv":
        clipped, _ = model.apply(params, ids, kv0, method=fwd)
        plain_cfg = MPTConfig(**{**kwargs, "clip_qkv": None})
        plain, _ = MPTForCausalLM(plain_cfg).apply(params, ids, kv0,
                                                   method=fwd)
        assert not np.allclose(np.asarray(clipped), np.asarray(plain))


def test_mpt_from_dict_reads_reference_attn_config():
    cfg = MPTConfig.from_dict({
        "d_model": 64, "n_heads": 8, "n_layers": 3, "vocab_size": 200,
        "attn_config": {"attn_type": "multiquery_attention", "alibi": True,
                        "alibi_bias_max": 16, "qk_ln": True,
                        "clip_qkv": 6.0},
    })
    assert cfg.multiquery and cfg.qk_ln and cfg.clip_qkv == 6.0
    assert cfg.alibi_bias_max == 16 and cfg.n_heads == 8


def test_llava_mpt_key_mapping():
    """Flax paths inside LlavaModel(text_mpt=...) map to the reference
    LLaVA-MPT key schema (llava/model/language_model/llava_mpt.py: LM under
    ``transformer.``, vision tower / projector hang off the transformer)."""
    from upscale_a_video_tpu.models.llava.convert import LLAVA_MPT_RENAMES
    from upscale_a_video_tpu.utils.convert import flax_path_to_torch_key

    def key(path):
        return flax_path_to_torch_key(tuple(path.split("/")),
                                      LLAVA_MPT_RENAMES)

    assert key("language_model/wte/embedding") == "transformer.wte.weight"
    assert (key("language_model/blocks_0/attn_Wqkv/kernel")
            == "transformer.blocks.0.attn.Wqkv.weight")
    assert (key("language_model/blocks_1/norm_1/weight")
            == "transformer.blocks.1.norm_1.weight")
    assert (key("language_model/norm_f/weight")
            == "transformer.norm_f.weight")
    assert (key("vision_tower/layers_0/mlp_fc1/kernel")
            == "transformer.vision_tower.vision_tower.vision_model."
               "encoder.layers.0.mlp.fc1.weight")
    assert (key("mm_projector_0/kernel")
            == "transformer.mm_projector.0.weight")


def test_llava_model_hosts_mpt_language_model():
    """LlavaModel with ``text_mpt`` runs the full splice→prefill→decode path
    (ref LlavaMPTForCausalLM duality)."""
    from upscale_a_video_tpu.models.llava.clip_vision import CLIPVisionConfig
    from upscale_a_video_tpu.models.llava.llava import LlavaConfig, LlavaModel

    vis = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=16,
                           intermediate_size=32, num_hidden_layers=1,
                           num_attention_heads=2)
    cfg = LlavaConfig(vision=vis, text_mpt=CFG)
    model = LlavaModel(cfg)
    ids = jnp.asarray(np.array([[1, 5, 0, 7]], np.int32))  # <image> at pos 2
    pixels = jnp.zeros((1, 28, 28, 3))

    def run(mdl):
        img = mdl.encode_image(pixels)
        emb = mdl.splice(ids, img, 2)
        logits, kv = mdl.prefill(emb, 16)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits2, kv = mdl.decode_one(tok, kv, emb.shape[1])
        return logits, logits2

    params = model.init(jax.random.PRNGKey(0), method=run)
    l1, l2 = model.apply(params, method=run)
    assert np.isfinite(np.asarray(l1)).all()
    assert np.isfinite(np.asarray(l2)).all()
    assert l1.shape == (1, CFG.vocab_size)
