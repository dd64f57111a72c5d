from .mesh import make_mesh, param_partition_spec, shard_params
from .temporal import (
    reference_windowed_apply,
    sharded_windowed_apply,
    windowed_apply_local,
)

__all__ = [
    "make_mesh",
    "param_partition_spec",
    "shard_params",
    "reference_windowed_apply",
    "sharded_windowed_apply",
    "windowed_apply_local",
]


def __getattr__(name):
    if name in ("build_sharded_denoise", "shard_video"):
        from . import sharded_pipeline

        return getattr(sharded_pipeline, name)
    raise AttributeError(name)
