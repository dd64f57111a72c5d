"""Conversation template + image preprocessing for the captioner
(ref llava/conversation.py:252,361-365 vicuna_v1 template;
llava/llava_agent.py:34 fixed question; llava/mm_utils.py:43
tokenizer_image_token).

vicuna_v1 renders as:
    <system>  USER: <image>\n<question> ASSISTANT:
with the <image> placeholder spliced at embedding level.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

SYSTEM = (
    "A chat between a curious user and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the user's "
    "questions."
)
QUESTION = "Describe this image and its style in a very detailed manner."
IMAGE_TOKEN_INDEX = -200  # ref llava/constants.py

# CLIP normalization (OpenAI stats)
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(image_u8: np.ndarray, size: int = 336) -> np.ndarray:
    """uint8 (H, W, 3) → normalized float32 (size, size, 3).

    Matches CLIPImageProcessor: shortest-edge resize (bicubic) + center crop +
    normalize (ref llava/mm_utils.py process_images default path)."""
    import jax.numpy as jnp

    from ...ops.resize import resize_2d

    h, w = image_u8.shape[:2]
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    img = np.asarray(
        resize_2d(jnp.asarray(image_u8, jnp.float32) / 255.0, (nh, nw), "bicubic")
    )
    top = (nh - size) // 2
    left = (nw - size) // 2
    img = img[top: top + size, left: left + size]
    return ((np.clip(img, 0, 1) - _MEAN) / _STD).astype(np.float32)


def build_caption_prompt(tokenizer) -> Tuple[np.ndarray, int]:
    """Tokenize the vicuna_v1 caption prompt; returns (ids (S,), image_pos)
    where ids[image_pos] is a placeholder the model splices patch features
    into (ref mm_utils.tokenizer_image_token)."""
    pre = f"{SYSTEM} USER: "
    post = f"\n{QUESTION} ASSISTANT:"
    pre_ids = tokenizer(pre, add_special_tokens=True)["input_ids"]
    post_ids = tokenizer(post, add_special_tokens=False)["input_ids"]
    placeholder = 0  # replaced at embedding level; id value is irrelevant
    ids = np.asarray(pre_ids + [placeholder] + post_ids, dtype=np.int32)
    return ids, len(pre_ids)
