from hifidiff_tpu.parallel.mesh import (
    batch_sharding,
    device_prefetch,
    make_mesh,
    replicated,
    shard_batch,
)
from hifidiff_tpu.parallel.tp import shard_params_tp

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "device_prefetch", "shard_params_tp"]
