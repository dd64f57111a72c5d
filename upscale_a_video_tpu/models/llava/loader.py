"""LLaVA weight loading: HF llava-v1.5 checkpoint directory → LlavaCaptioner.

Handles sharded .bin/.safetensors state dicts, optional delta application
(ref llava/model/apply_delta.py), and tokenizer loading. Configs are read from
the checkpoint's config.json (text + vision sub-configs).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional


def _load_sharded_state(model_dir: Path) -> dict:
    sd = {}
    bins = sorted(model_dir.glob("pytorch_model*.bin"))
    if bins:
        import torch

        for b in bins:
            part = torch.load(str(b), map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() for k, v in part.items()})
        return sd
    safes = sorted(model_dir.glob("*.safetensors"))
    if safes:
        from safetensors.numpy import load_file

        for s in safes:
            sd.update(load_file(str(s)))
        return sd
    raise FileNotFoundError(f"no weights in {model_dir}")


def load_llava_captioner(
    model_dir: str,
    base_dir: Optional[str] = None,
    dtype=None,
    max_new_tokens: int = 64,
    load_8bit: bool = False,
):
    """Build a :class:`LlavaCaptioner` from an HF checkpoint directory.

    ``base_dir`` applies the checkpoint as a delta over a base LLaMA
    (ref apply_delta.py semantics). ``load_8bit`` stores the large matmul
    weights as per-channel int8 (ref llava/model/builder.py:29-38
    bitsandbytes path; see utils/quant.py).
    """
    import jax.numpy as jnp

    from .clip_vision import CLIPVisionConfig
    from .convert import LLAVA_MPT_RENAMES, LLAVA_RENAMES, apply_delta
    from .llama import LlamaConfig
    from .llava import LlavaCaptioner, LlavaConfig, LlavaModel
    from .mpt import MPTConfig
    from ...utils.convert import convert_state_dict
    from ...utils.param_init import fast_init

    root = Path(model_dir)
    with open(root / "config.json") as f:
        hf_cfg = json.load(f)

    vis = hf_cfg.get("vision_config", {})
    vision_cfg = CLIPVisionConfig.from_dict(vis) if vis else CLIPVisionConfig()
    # MPT-backed LLaVA (ref llava/model/language_model/llava_mpt.py):
    # "llava_mpt" model_type / MPT-shaped config fields select the MPT decoder
    is_mpt = ("mpt" in hf_cfg.get("model_type", "")
              or "attn_config" in hf_cfg or "d_model" in hf_cfg)
    if is_mpt:
        cfg = LlavaConfig(vision=vision_cfg,
                          text_mpt=MPTConfig.from_dict(hf_cfg))
        renames = LLAVA_MPT_RENAMES
    else:
        cfg = LlavaConfig(vision=vision_cfg,
                          text=LlamaConfig.from_dict(hf_cfg))
        renames = LLAVA_RENAMES

    model = LlavaModel(cfg, dtype=dtype or jnp.bfloat16)
    img_size = vision_cfg.image_size
    pixels0 = jnp.zeros((1, img_size, img_size, 3))
    ids0 = jnp.zeros((1, 8), jnp.int32)

    def full(mdl, pixels, ids):
        img = mdl.encode_image(pixels)
        emb = mdl.splice(ids, img, 1)
        return mdl.prefill(emb, 16)

    template = fast_init(model, pixels0, ids0, method=full, zeros=True)

    sd = _load_sharded_state(root)
    if base_dir is not None:
        base = _load_sharded_state(Path(base_dir))
        sd = apply_delta(base, sd)

    params, report = convert_state_dict(template["params"], sd,
                                        renames=renames, strict=False)
    if report["missing"]:
        print(f"llava: {len(report['missing'])} params kept at init "
              f"(e.g. {report['missing'][:3]})")

    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(str(root), use_fast=False)
    except Exception:
        tokenizer = None

    if load_8bit:
        from ...utils.quant import quantize_tree, tree_nbytes

        full = tree_nbytes(params)
        params = quantize_tree(params)
        print(f"llava: int8 weight-only quantization "
              f"{full / 1e9:.2f} GB → {tree_nbytes(params) / 1e9:.2f} GB")

    return LlavaCaptioner(model, {"params": params}, tokenizer=tokenizer,
                          max_new_tokens=max_new_tokens, quantized=load_8bit)
