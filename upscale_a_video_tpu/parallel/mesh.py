"""Device-mesh helpers and sharding rules.

The reference has no distribution in the VSR path (SURVEY §2.12) — its serial
chunk/tile loops are the units we parallelize. The TPU design (SURVEY §5.7-5.8):

- ``data`` axis: videos / tiles / CFG batch — embarrassingly parallel.
- ``model`` axis: tensor parallelism over attention heads and MLP/conv output
  channels, expressed purely through parameter PartitionSpecs; XLA inserts the
  all-reduce/all-gather collectives over ICI (scaling-book recipe: pick a mesh,
  annotate shardings, let the compiler place collectives).

No hand-written collectives are needed for the model path; ``shard_map`` is
reserved for the halo-exchange temporal-chunk pipeline (parallel/temporal.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data × model) mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, axis_names)


# Parameter names whose last axis shards over the model axis (output-parallel),
# and those whose first (input) axis shards (row-parallel, following the
# megatron pattern: qkv/in-proj column-parallel, out-proj row-parallel).
_COL_PARALLEL_SUFFIXES = ("to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj",
                          "linear_1", "proj", "mlp_fc1")
_ROW_PARALLEL_SUFFIXES = ("to_out_0", "out_proj", "mlp_fc2", "net_2", "linear_2")


def param_partition_spec(path: Tuple[str, ...], value, model_axis: str = "model") -> P:
    """Sharding rule for one parameter.

    Dense kernels in attention/MLP shard over the model axis when divisible;
    conv kernels shard over output channels; everything else replicates.
    """
    shape = np.shape(value)
    if not shape:
        return P()
    parent = path[-2] if len(path) >= 2 else ""
    leaf = path[-1]
    if leaf != "kernel":
        return P()
    if any(parent == s or parent.startswith(s) for s in _COL_PARALLEL_SUFFIXES):
        return P(*([None] * (len(shape) - 1) + [model_axis]))
    if any(parent == s or parent.startswith(s) for s in _ROW_PARALLEL_SUFFIXES):
        return P(*([model_axis] + [None] * (len(shape) - 1)))
    if len(shape) >= 4:
        # conv kernels: shard output channels (last axis)
        return P(*([None] * (len(shape) - 1) + [model_axis]))
    return P()


def _tree_map_with_path(fn, tree, path=()):
    if isinstance(tree, dict):
        return {k: _tree_map_with_path(fn, v, path + (k,)) for k, v in tree.items()}
    return fn(path, tree)


def shard_params(params, mesh: Mesh, model_axis: str = "model"):
    """Device_put a param tree with TP shardings where divisible, replicated
    otherwise."""
    model_size = mesh.shape[model_axis]

    def place(path, value):
        spec = param_partition_spec(path, value, model_axis)
        # drop the spec if the sharded axis isn't divisible
        for ax, name in enumerate(spec):
            if name is not None and np.shape(value)[ax] % model_size != 0:
                spec = P()
                break
        return jax.device_put(value, NamedSharding(mesh, spec))

    return _tree_map_with_path(place, params)
