"""LLaVA components vs HF transformers (torch): LLaMA decoder logits and CLIP
vision features, weights moved through the converter — verifies both the
modules and the key mapping against the real implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.models.llava.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionTower,
)
from upscale_a_video_tpu.models.llava.convert import LLAVA_RENAMES
from upscale_a_video_tpu.models.llava.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    causal_prefill_mask,
)
from upscale_a_video_tpu.utils.convert import convert_state_dict


@pytest.mark.slow
def test_llama_logits_match_transformers():
    import torch
    import transformers

    t_cfg = transformers.LlamaConfig(
        vocab_size=120, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32, rms_norm_eps=1e-5, rope_theta=10000.0,
    )
    t_model = transformers.LlamaForCausalLM(t_cfg)
    t_model.eval()
    sd = {k: v.detach().float().numpy() for k, v in t_model.state_dict().items()}

    cfg = LlamaConfig(vocab_size=120, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=32)
    model = LlamaForCausalLM(cfg)
    s, max_len = 6, 8
    d = cfg.hidden_size // cfg.num_attention_heads
    kv0 = jnp.zeros((cfg.num_hidden_layers, 2, 1, cfg.kv_heads, max_len, d))

    def init_fn(mdl, ids):
        emb = mdl.embed(ids)
        return mdl(emb, jnp.arange(ids.shape[1]), kv0, 0,
                   causal_prefill_mask(ids.shape[1], max_len))

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, s), jnp.int32),
                        method=init_fn)

    # our flax keys → HF keys via the language-model part of the LLaVA table
    renames = {k: v for k, v in LLAVA_RENAMES.items()}
    # top-level here is the model itself (no "language_model." prefix)
    renames.update({"embed_tokens.weight": "model.embed_tokens.weight"})
    converted, report = convert_state_dict(
        params["params"], sd,
        renames={**{"model.": "model.", "embed_tokens.weight": "model.embed_tokens.weight",
                    "lm_head": "lm_head"},
                 "self_attn_q_proj": "self_attn.q_proj",
                 "self_attn_k_proj": "self_attn.k_proj",
                 "self_attn_v_proj": "self_attn.v_proj",
                 "self_attn_o_proj": "self_attn.o_proj",
                 "mlp_gate_proj": "mlp.gate_proj",
                 "mlp_up_proj": "mlp.up_proj",
                 "mlp_down_proj": "mlp.down_proj"},
        strict=True)
    assert all("rotary" in k or "position_ids" in k for k in report["unused"]), \
        report["unused"]

    ids = np.array([[1, 7, 42, 99, 5, 3]], dtype=np.int64)
    with torch.no_grad():
        want = t_model(torch.from_numpy(ids)).logits.numpy()

    p = {"params": converted}
    emb = model.apply(p, jnp.asarray(ids, jnp.int32), method=model.embed)
    logits, _ = model.apply(p, emb, jnp.arange(s), kv0, 0,
                            causal_prefill_mask(s, max_len))
    np.testing.assert_allclose(np.asarray(logits), want, atol=5e-4)


def test_clip_vision_matches_transformers():
    import torch
    import transformers

    t_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu",
    )
    t_model = transformers.CLIPVisionModel(t_cfg)
    t_model.eval()
    sd = {k.replace("vision_model.", ""): v.detach().numpy()
          for k, v in t_model.state_dict().items()}

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=28, patch_size=14)
    model = CLIPVisionTower(cfg, feature_layer=-2)
    x = np.random.RandomState(0).randn(1, 28, 28, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    renames = {
        "layers.": "encoder.layers.",
        "patch_embedding.weight": "embeddings.patch_embedding.weight",
        "class_embedding": "embeddings.class_embedding",
        "position_embedding.weight": "embeddings.position_embedding.weight",
        "mlp_fc1": "mlp.fc1", "mlp_fc2": "mlp.fc2",
        "self_attn_out_proj": "self_attn.out_proj",
        "self_attn_q_proj": "self_attn.q_proj",
        "self_attn_k_proj": "self_attn.k_proj",
        "self_attn_v_proj": "self_attn.v_proj",
    }
    converted, report = convert_state_dict(params["params"], sd, renames,
                                           strict=True)

    with torch.no_grad():
        out = t_model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      output_hidden_states=True)
        # LLaVA feature_select: hidden_states[-2], patch tokens only
        want = out.hidden_states[-2][:, 1:].numpy()

    got = np.asarray(model.apply({"params": converted}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4)
