from cppf2_tpu.parallel.mesh import (
    image_sharded_tuple_vote,
    make_mesh,
    make_slice_mesh,
    shard_batch,
    replicate,
    tuple_sharded_sphere_vote,
)

__all__ = [
    "image_sharded_tuple_vote",
    "make_mesh",
    "make_slice_mesh",
    "shard_batch",
    "replicate",
    "tuple_sharded_sphere_vote",
]
