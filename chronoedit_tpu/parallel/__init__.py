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

__all__ = [
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
