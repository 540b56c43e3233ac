from deepvcp_tpu.parallel.mesh import (
    DATA_AXIS,
    POINT_AXIS,
    batch_pair_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "POINT_AXIS",
    "make_mesh",
    "batch_pair_sharding",
    "replicated",
    "shard_batch",
]
