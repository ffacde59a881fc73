from mvc_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    shard_batch,
    replicate,
)
from mvc_tpu.parallel.distributed import data_shard, initialize, make_global_mesh

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "shard_batch",
    "replicate",
    "data_shard",
    "initialize",
    "make_global_mesh",
]
