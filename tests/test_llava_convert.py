"""LLaVA converter: key-mapping spot checks + tiny-config round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.models.llava.clip_vision import CLIPVisionConfig
from upscale_a_video_tpu.models.llava.convert import LLAVA_RENAMES, apply_delta
from upscale_a_video_tpu.models.llava.llama import LlamaConfig
from upscale_a_video_tpu.models.llava.llava import LlavaConfig, LlavaModel
from upscale_a_video_tpu.utils.convert import (
    convert_state_dict,
    flax_path_to_torch_key,
    flax_tensor_to_torch,
)


def test_key_spot_checks():
    k = flax_path_to_torch_key(
        ("vision_tower", "layers_3", "self_attn_q_proj", "kernel"), LLAVA_RENAMES)
    assert k == ("model.vision_tower.vision_tower.vision_model.encoder."
                 "layers.3.self_attn.q_proj.weight")
    k = flax_path_to_torch_key(("vision_tower", "patch_embedding", "kernel"),
                               LLAVA_RENAMES)
    assert k == ("model.vision_tower.vision_tower.vision_model.embeddings."
                 "patch_embedding.weight")
    k = flax_path_to_torch_key(("language_model", "model", "layers_0",
                                "self_attn_q_proj", "kernel"), LLAVA_RENAMES)
    assert k == "model.layers.0.self_attn.q_proj.weight"
    k = flax_path_to_torch_key(("language_model", "model", "layers_1",
                                "mlp_gate_proj", "kernel"), LLAVA_RENAMES)
    assert k == "model.layers.1.mlp.gate_proj.weight"
    k = flax_path_to_torch_key(("language_model", "embed_tokens", "embedding"),
                               LLAVA_RENAMES)
    assert k == "model.embed_tokens.weight"
    k = flax_path_to_torch_key(("language_model", "lm_head", "kernel"),
                               LLAVA_RENAMES)
    assert k == "lm_head.weight"
    k = flax_path_to_torch_key(("mm_projector_0", "kernel"), LLAVA_RENAMES)
    assert k == "model.mm_projector.0.weight"
    k = flax_path_to_torch_key(
        ("language_model", "model", "layers_0", "input_layernorm", "weight"),
        LLAVA_RENAMES)
    assert k == "model.layers.0.input_layernorm.weight"


def _tree_items(tree, prefix=()):
    if isinstance(tree, dict):
        for kk, v in tree.items():
            yield from _tree_items(v, prefix + (kk,))
    else:
        yield prefix, tree


def test_roundtrip_tiny():
    cfg = LlavaConfig(
        vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=28, patch_size=14),
        text=LlamaConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                         num_hidden_layers=2, num_attention_heads=2),
    )
    model = LlavaModel(cfg)
    pixels = jnp.zeros((1, 28, 28, 3))
    ids = jnp.zeros((1, 4), dtype=jnp.int32)

    def full(mdl, pixels, ids):
        img = mdl.encode_image(pixels)
        emb = mdl.splice(ids, img, 1)
        return mdl.prefill(emb, 12)

    params = model.init(jax.random.PRNGKey(0), pixels, ids, method=full)

    rng = np.random.RandomState(0)
    sd = {}
    for path, val in _tree_items(params["params"]):
        key = flax_path_to_torch_key(path, LLAVA_RENAMES)
        sd[key] = flax_tensor_to_torch(
            rng.randn(*np.shape(val)).astype(np.float32), path[-1])

    converted, report = convert_state_dict(params["params"], sd, LLAVA_RENAMES)
    assert not report["missing"], report["missing"][:5]
    assert not report["unused"], report["unused"][:5]


def test_apply_delta():
    base = {"a": np.ones((2, 3), np.float32)}
    delta = {"a": np.full((2, 3), 0.5, np.float32),
             "b": np.zeros((1,), np.float32)}
    out = apply_delta(base, delta)
    np.testing.assert_allclose(out["a"], 1.5)
    assert "b" in out
    # vocab expansion: delta larger than base on axis 0
    base = {"emb": np.ones((4, 2), np.float32)}
    delta = {"emb": np.full((6, 2), 0.25, np.float32)}
    out = apply_delta(base, delta)
    np.testing.assert_allclose(out["emb"][:4], 1.25)
    np.testing.assert_allclose(out["emb"][4:], 0.25)
