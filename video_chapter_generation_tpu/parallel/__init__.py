"""Mesh, shardings and host-level collectives."""

from .dist import (
    all_gather_object,
    barrier,
    broadcast_object,
    initialize,
    is_primary,
    process_count,
    process_index,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    replicated,
    shard_batch,
    shard_params_tp,
    shard_params_zero,
    use_mesh,
)

__all__ = [
    "all_gather_object",
    "barrier",
    "broadcast_object",
    "initialize",
    "is_primary",
    "process_count",
    "process_index",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "local_batch_size",
    "make_mesh",
    "replicated",
    "shard_batch",
    "shard_params_tp",
    "shard_params_zero",
    "use_mesh",
]
