"""Device meshes and sharding rules."""

from mr_mt3_tpu.parallel.mesh import (
    batch_sharding,
    device_cap,
    init_multihost,
    local_mesh,
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
)
