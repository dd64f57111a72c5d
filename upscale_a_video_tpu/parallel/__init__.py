from .mesh import make_mesh, param_partition_spec, shard_params

__all__ = ["make_mesh", "param_partition_spec", "shard_params"]
