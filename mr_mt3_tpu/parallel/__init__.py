"""Device meshes and sharding rules."""

from mr_mt3_tpu.parallel.mesh import (
    batch_sharding,
    init_multihost,
    local_mesh,
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
)
