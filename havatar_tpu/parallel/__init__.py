"""SPMD parallelism: mesh construction, sharding rules, collectives."""

from havatar_tpu.parallel.mesh import (
    auto_batch_shardings,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    ray_sharding,
    replicated,
    shard_batch,
)
from havatar_tpu.parallel import comm
