from audioset_convnext_inf_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicate,
    shard_batch,
)
from audioset_convnext_inf_tpu.parallel.dist import initialize_distributed

__all__ = [
    "get_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "initialize_distributed",
]
