"""Captioner finetuning (ref llava/train/train.py): label splicing/masking,
loss decreases under both the frozen-vision full step and the LoRA step."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from upscale_a_video_tpu.models.llava.clip_vision import CLIPVisionConfig
from upscale_a_video_tpu.models.llava.llama import LlamaConfig
from upscale_a_video_tpu.models.llava.llava import LlavaConfig, LlavaModel
from upscale_a_video_tpu.training.lora import init_lora
from upscale_a_video_tpu.training.train_llava import (
    IGNORE_INDEX,
    frozen_vision_optimizer,
    make_caption_lora_step,
    make_caption_train_step,
    splice_labels,
)

VIS = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=16,
                       intermediate_size=32, num_hidden_layers=1,
                       num_attention_heads=2)
TXT = LlamaConfig(vocab_size=60, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  max_position_embeddings=32)
CFG = LlavaConfig(vision=VIS, text=TXT)
IMAGE_POS = 2
N_PATCH = (28 // 14) ** 2  # 4


def _batch(seed=0, b=2, s=8, prompt_len=4):
    rng = np.random.RandomState(seed)
    ids = rng.randint(3, 60, (b, s)).astype(np.int32)
    ids[:, IMAGE_POS] = 1  # <image> placeholder
    labels = splice_labels(ids, IMAGE_POS, N_PATCH, prompt_len)
    return {
        "pixels": jnp.asarray(rng.rand(b, 28, 28, 3).astype(np.float32)),
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
    }


def _model_params():
    model = LlavaModel(CFG)

    def init_run(mdl, pixels, ids):
        img = mdl.encode_image(pixels)
        emb = mdl.splice(ids, img, IMAGE_POS)
        return mdl.prefill(emb, emb.shape[1])

    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b["pixels"], b["input_ids"],
                        method=init_run)
    return model, params


def test_splice_labels_masks_prompt_and_image():
    ids = np.arange(10, 18, dtype=np.int32)[None].repeat(2, 0)
    ids[:, IMAGE_POS] = 1
    lab = splice_labels(ids, IMAGE_POS, N_PATCH, prompt_len=4)
    assert lab.shape == (2, 8 - 1 + N_PATCH)
    # everything before the answer span is IGNORE
    assert (lab[:, : 4 - 1 + N_PATCH] == IGNORE_INDEX).all()
    # the answer tokens survive at their spliced positions
    for j in range(4, 8):
        assert (lab[:, j - 1 + N_PATCH] == ids[:, j]).all()


@pytest.mark.slow
def test_full_step_decreases_loss_and_freezes_vision():
    model, params = _model_params()
    base = params["params"]
    opt = frozen_vision_optimizer(optax.adam(5e-3), base)
    step = jax.jit(make_caption_train_step(model, opt, IMAGE_POS))
    p = base
    opt_state = opt.init(p)
    batch = _batch()
    losses = []
    for i in range(8):
        p, opt_state, loss = step(p, opt_state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # vision tower unchanged
    v0 = jax.tree_util.tree_leaves(base["vision_tower"])
    v1 = jax.tree_util.tree_leaves(p["vision_tower"])
    for a, b in zip(v0, v1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # language model DID move
    l0 = base["language_model"]["lm_head"]["kernel"]
    l1 = p["language_model"]["lm_head"]["kernel"]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_lora_step_decreases_loss():
    model, params = _model_params()
    base = params["params"]
    lora = init_lora(base, rank=4, seed=1)
    opt = optax.adam(1e-2)
    step = jax.jit(make_caption_lora_step(model, opt, IMAGE_POS))
    opt_state = opt.init(lora)
    batch = _batch(seed=1)
    losses = []
    for i in range(10):
        lora, opt_state, loss = step(base, lora, opt_state, batch,
                                     jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.02
