from .mesh import (
    basis_sharding,
    make_mesh,
    make_pod_mesh,
    replicated_sharding,
    shard_operator,
    vector_sharding,
)

__all__ = [
    "make_mesh",
    "make_pod_mesh",
    "basis_sharding",
    "vector_sharding",
    "replicated_sharding",
    "shard_operator",
]
