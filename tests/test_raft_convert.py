"""RAFT checkpoint mapping round-trip (same strategy as test_convert.py)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.models.raft import RAFT, RAFT_RENAMES
from upscale_a_video_tpu.utils.convert import (
    convert_state_dict,
    flax_path_to_torch_key,
    flax_tensor_to_torch,
)


def _tree_items(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_items(v, prefix + (k,))
    else:
        yield prefix, tree


def test_key_spot_checks():
    assert (
        flax_path_to_torch_key(("fnet", "layer1_0", "conv1", "kernel"), RAFT_RENAMES)
        == "fnet.layer1.0.conv1.weight"
    )
    assert (
        flax_path_to_torch_key(("cnet", "norm1", "bn", "mean"), RAFT_RENAMES)
        == "cnet.norm1.running_mean"
    )
    assert (
        flax_path_to_torch_key(("cnet", "norm1", "bn", "scale"), RAFT_RENAMES)
        == "cnet.norm1.weight"
    )
    assert (
        flax_path_to_torch_key(
            ("update_block", "encoder", "conv_", "kernel"), RAFT_RENAMES)
        == "update_block.encoder.conv.weight"
    )
    assert (
        flax_path_to_torch_key(("update_block", "mask_0", "kernel"), RAFT_RENAMES)
        == "update_block.mask.0.weight"
    )
    assert (
        flax_path_to_torch_key(
            ("fnet", "layer2_0", "downsample_0", "kernel"), RAFT_RENAMES)
        == "fnet.layer2.0.downsample.0.weight"
    )


@pytest.mark.slow
def test_roundtrip():
    model = RAFT()
    dummy = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), dummy, dummy, 1)

    rng = np.random.RandomState(0)
    sd = {}
    for path, val in _tree_items(params["params"]):
        key = flax_path_to_torch_key(path, RAFT_RENAMES)
        sd[key] = flax_tensor_to_torch(rng.randn(*np.shape(val)).astype(np.float32),
                                       path[-1])

    converted, report = convert_state_dict(params["params"], sd, RAFT_RENAMES)
    assert not report["missing"], report["missing"][:5]
    assert not report["unused"], report["unused"][:5]
