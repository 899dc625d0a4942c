from hifidiff_tpu.parallel.distributed import (
    is_main_process,
    local_batch_to_global,
    maybe_initialize,
    process_count,
    process_index,
)
from hifidiff_tpu.parallel.mesh import (
    batch_sharding,
    device_prefetch,
    local_shard,
    make_mesh,
    replicate_global,
    replicated,
    shard_batch,
)
from hifidiff_tpu.parallel.tp import shard_params_tp

__all__ = ["make_mesh", "batch_sharding", "replicated", "replicate_global",
           "shard_batch", "device_prefetch", "shard_params_tp",
           "maybe_initialize", "is_main_process", "process_index",
           "process_count", "local_batch_to_global", "local_shard"]
