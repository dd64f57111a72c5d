"""LLaVA checkpoint conversion: HF llava-v1.5 state dict → flax LlavaModel.

Key schema (liuhaotian/llava-v1.5-*):
    model.vision_tower.vision_tower.vision_model.embeddings.{patch,class,position}_embedding
    model.vision_tower.vision_tower.vision_model.encoder.layers.N.{self_attn,mlp,layer_norm1,layer_norm2}
    model.mm_projector.{0,2}.{weight,bias}
    model.embed_tokens.weight / model.layers.N.* / model.norm.weight / lm_head.weight

Reuses the generic template-walk converter (utils/convert.py) with a rename
table; also applies delta weights (ref llava/model/apply_delta.py semantics:
base + delta elementwise, vocab rows appended) when a base state dict is given.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ...utils.convert import convert_state_dict

# Applied as ordered str.replace; more-specific keys first so the vision
# "layers." rename never touches the language model's layers.
LLAVA_RENAMES: Dict[str, str] = {
    # vision tower (flax "vision_tower/layers_N/..." →
    # "model.vision_tower.vision_tower.vision_model.encoder.layers.N....")
    "vision_tower.": "model.vision_tower.vision_tower.vision_model.",
    "vision_model.layers.": "vision_model.encoder.layers.",
    "vision_model.patch_embedding.weight": "vision_model.embeddings.patch_embedding.weight",
    "vision_model.class_embedding": "vision_model.embeddings.class_embedding",
    "vision_model.position_embedding.weight": "vision_model.embeddings.position_embedding.weight",
    "mlp_fc1": "mlp.fc1",
    "mlp_fc2": "mlp.fc2",
    # projector (index suffix already mapped to ".0"/".2" by the generic rule)
    "mm_projector.0": "model.mm_projector.0",
    "mm_projector.2": "model.mm_projector.2",
    # language model
    "language_model.embed_tokens.weight": "model.embed_tokens.weight",
    "language_model.model.": "model.",
    "language_model.lm_head": "lm_head",
    "self_attn_q_proj": "self_attn.q_proj",
    "self_attn_k_proj": "self_attn.k_proj",
    "self_attn_v_proj": "self_attn.v_proj",
    "self_attn_o_proj": "self_attn.o_proj",
    "self_attn_out_proj": "self_attn.out_proj",
    "mlp_gate_proj": "mlp.gate_proj",
    "mlp_up_proj": "mlp.up_proj",
    "mlp_down_proj": "mlp.down_proj",
}


# MPT decoder (ref llava/model/language_model/mpt/, HF mosaicml/mpt-* key
# schema: transformer.{wte,wpe,norm_f}, transformer.blocks.N.{norm_1,
# attn.Wqkv,attn.out_proj,norm_2,ffn.up_proj,ffn.down_proj}). The generic
# index rule turns flax ``norm_1`` into ``norm.1`` — undone here.
MPT_RENAMES: Dict[str, str] = {
    "attn_Wqkv": "attn.Wqkv",
    "attn_out_proj": "attn.out_proj",
    "attn_q_ln": "attn.q_ln",
    "attn_k_ln": "attn.k_ln",
    "ffn_up_proj": "ffn.up_proj",
    "ffn_down_proj": "ffn.down_proj",
    "norm.1": "norm_1",
    "norm.2": "norm_2",
    "blocks.": "transformer.blocks.",
    "wte.weight": "transformer.wte.weight",
    "wpe.weight": "transformer.wpe.weight",
    "norm_f.": "transformer.norm_f.",
}

# The same table for the MPT LM living inside LlavaModel. In the reference's
# LLaVA-MPT (llava/model/language_model/llava_mpt.py) the vision tower and
# projector hang off the *transformer* module, so the LLaMA-layout "model."
# prefix from the vision/projector entries is rewritten to "transformer."
# at the end (MPT's own keys never contain "model.").
LLAVA_MPT_RENAMES: Dict[str, str] = dict(
    {"language_model.": ""},
    **{k: v for k, v in LLAVA_RENAMES.items() if "vision" in k
       or "mm_projector" in k or k.startswith("mlp_fc")
       or "class_embedding" in k or "position_embedding" in k},
    **MPT_RENAMES,
    **{"model.vision_tower": "transformer.vision_tower",
       "model.mm_projector": "transformer.mm_projector"},
)


def convert_mpt(template_params, torch_state: Dict[str, np.ndarray],
                strict: bool = True):
    """HF/mosaicml MPT state dict → flax ``MPTForCausalLM`` params."""
    return convert_state_dict(template_params, torch_state,
                              renames=MPT_RENAMES, strict=strict)


def apply_delta(base: Dict[str, np.ndarray], delta: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """base + delta (ref llava/model/apply_delta.py): elementwise add; rows
    beyond the base vocab (embed_tokens / lm_head) come from the delta."""
    out = {}
    for k, dv in delta.items():
        if k in base:
            bv = base[k]
            if bv.shape == dv.shape:
                out[k] = bv + dv
            else:
                merged = dv.copy()
                merged[: bv.shape[0]] += bv
                out[k] = merged
        else:
            out[k] = dv
    return out


def convert_llava(template_params, torch_state: Dict[str, np.ndarray],
                  strict: bool = False):
    """Template-walk conversion with the LLaVA rename table."""
    return convert_state_dict(template_params, torch_state,
                              renames=LLAVA_RENAMES, strict=strict)
