"""from_pretrained_2d inflation + FLOP counting."""

import jax
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.config import UNetVideoConfig
from upscale_a_video_tpu.models import UNetVideoModel
from upscale_a_video_tpu.training import temporal_param_mask
from upscale_a_video_tpu.utils.convert import (
    flax_path_to_torch_key,
    flax_tensor_to_torch,
    from_pretrained_2d,
)
from upscale_a_video_tpu.utils.flops import count_params, flops_of

TINY = UNetVideoConfig(
    block_out_channels=(8, 16, 16, 32), attention_head_dim=4,
    norm_num_groups=4, cross_attention_dim=16,
)


def _tree_items(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_items(v, prefix + (k,))
    else:
        yield prefix, tree


def test_2d_inflation_loads_spatial_keeps_temporal():
    model = UNetVideoModel(TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), 0,
                        jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 3, 16)), 0)
    mask = dict(_tree_items(temporal_param_mask(params)["params"]))

    # synthetic "2D checkpoint": only the non-temporal keys
    rng = np.random.RandomState(0)
    sd = {}
    for path, val in _tree_items(params["params"]):
        if mask[path]:
            continue  # temporal params absent from a 2D checkpoint
        key = flax_path_to_torch_key(path)
        sd[key] = flax_tensor_to_torch(rng.randn(*np.shape(val)).astype(np.float32),
                                       path[-1])

    loaded, report = from_pretrained_2d(params["params"], sd)
    # all missing params are temporal
    for flax_path, _torch_key in report["missing"]:
        assert any(t in flax_path for t in
                   ("temp_block", "attn_temporal", "norm_temporal",
                    "resblock_temporal", "resblocks_3d")), flax_path
    assert not report["unused"]

    before = dict(_tree_items(params["params"]))
    after = dict(_tree_items(loaded))
    for path in before:
        if mask[path]:  # temporal: template init preserved
            np.testing.assert_array_equal(np.asarray(after[path]),
                                          np.asarray(before[path]))
        else:  # spatial: loaded from the 2D dict
            key = flax_path_to_torch_key(path)
            assert key in sd


def test_count_params():
    params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros((4,))}}
    assert count_params(params) == 10


def test_flops_of_matmul():
    a = jnp.zeros((64, 128))
    b = jnp.zeros((128, 32))
    f = flops_of(lambda a, b: a @ b, a, b)
    if f is not None:  # backend-dependent availability
        assert abs(f - 2 * 64 * 128 * 32) / f < 0.5
