from cppf2_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    tuple_sharded_sphere_vote,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "tuple_sharded_sphere_vote"]
