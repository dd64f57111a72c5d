"""Captioner (LLaVA) finetuning — the reference's vendored training path
(ref llava/train/train.py:756 ``train``) rebuilt TPU-idiomatically: the
visual-instruction objective is next-token cross-entropy over the caption
tokens with the prompt and image-patch positions masked to IGNORE_INDEX
(ref llava/train/train.py ``preprocess_v1`` label masking), optimized either
full-parameter (with the vision tower frozen, ref ``freeze_backbone`` /
``tune_mm_mlp_adapter``) or LoRA-adapter-only (ref ``lora_enable``,
training/lora.py).

No HF Trainer / DeepSpeed: one jitted step; ZeRO-style sharding is the
dp×tp mesh of parallel/mesh.py when needed (params are a pytree argument).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.llava.llama import causal_prefill_mask
from ..models.llava.llava import LlavaModel
from .lora import apply_lora, make_lora_train_step

IGNORE_INDEX = -100  # ref llava/constants.py IGNORE_INDEX


def splice_labels(input_ids, image_pos: int, n_patches: int,
                  prompt_len: int):
    """Build (B, S-1+P) labels for the spliced sequence: IGNORE everywhere
    except the answer span (tokens after ``prompt_len`` in the original text
    sequence), shifted through the image splice (the <image> placeholder at
    ``image_pos`` becomes ``n_patches`` ignored positions — ref
    llava/train/train.py preprocess_v1 + prepare_inputs_labels_for_multimodal
    label plumbing)."""
    import numpy as np

    ids = np.asarray(input_ids)
    b, s = ids.shape
    out = np.full((b, s - 1 + n_patches), IGNORE_INDEX, np.int64)
    for j in range(s):
        if j <= image_pos or j < prompt_len:
            continue
        out[:, j - 1 + n_patches] = ids[:, j]
    return out


def caption_loss_fn(model: LlavaModel, image_pos: int):
    """Returns ``loss(params, batch, key)`` where batch =
    {"pixels" (B,H,W,3), "input_ids" (B,S), "labels" (B,S-1+P)} — standard
    teacher-forced CE, positions with IGNORE_INDEX excluded."""

    def run(mdl, pixels, input_ids):
        img = mdl.encode_image(pixels)
        emb = mdl.splice(input_ids, img, image_pos)
        s = emb.shape[1]
        logits, _ = mdl.language_model(
            emb, jnp.arange(s), None, 0, causal_prefill_mask(s, s))
        return logits

    def loss(params, batch, key):
        del key
        logits = model.apply({"params": params}, batch["pixels"],
                             batch["input_ids"], method=run)
        # next-token prediction: logits at t predict labels at t+1; the
        # labels array is already aligned to the spliced sequence, so shift
        # logits left by one
        logits = logits[:, :-1].astype(jnp.float32)
        labels = batch["labels"][:, 1:]
        valid = labels != IGNORE_INDEX
        safe = jnp.where(valid, labels, 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
        return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)

    return loss


def vision_frozen_mask(params) -> Any:
    """Label pytree: "train" for everything except the vision tower, which
    gets "freeze" (ref llava/train/train.py ``freeze_backbone``-style
    selective tuning)."""

    def walk(tree, frozen):
        if isinstance(tree, dict):
            return {k: walk(v, frozen or k == "vision_tower")
                    for k, v in tree.items()}
        return "freeze" if frozen else "train"

    return walk(params, False)


def frozen_vision_optimizer(inner, params):
    """Wrap ``inner`` so vision-tower updates are zeroed (NB: ``optax.masked``
    would pass unmasked gradients through raw — multi_transform with
    set_to_zero is the correct freeze)."""
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()},
        vision_frozen_mask(params))


def make_caption_train_step(model: LlavaModel, optimizer, image_pos: int):
    """Full-parameter step with the vision tower frozen. Returns
    ``step(params, opt_state, batch, key) -> (params, opt_state, loss)``."""
    loss_fn = caption_loss_fn(model, image_pos)

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_caption_lora_step(model: LlavaModel, optimizer, image_pos: int,
                           alpha: float = 16.0):
    """LoRA-adapter-only step (ref train.py:100-106 lora_enable):
    ``step(base_params, lora, opt_state, batch, key)``."""
    return make_lora_train_step(caption_loss_fn(model, image_pos), optimizer,
                                alpha=alpha)
