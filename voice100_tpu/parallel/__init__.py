"""Device mesh, shardings, and distributed helpers."""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    infer_param_spec,
    shard_params,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "infer_param_spec",
    "shard_params",
    "shard_batch",
]
