from chronoedit_tpu.parallel.mesh import MeshConfig, make_mesh
from chronoedit_tpu.parallel.sharding import (
    dit_param_sharding,
    shard_params,
    replicate,
)
from chronoedit_tpu.parallel.context import (
    ring_attention,
    ulysses_attention,
    split_sequence,
    gather_sequence,
)
from chronoedit_tpu.parallel.distributed import (
    collate_metrics,
    init_distributed,
    host_local_to_global,
    is_primary,
    local_batch_size,
    process_count,
    process_index,
)

__all__ = [
    "collate_metrics",
    "init_distributed",
    "host_local_to_global",
    "is_primary",
    "local_batch_size",
    "process_count",
    "process_index",
    "MeshConfig",
    "make_mesh",
    "dit_param_sharding",
    "shard_params",
    "replicate",
    "ring_attention",
    "ulysses_attention",
    "split_sequence",
    "gather_sequence",
]
