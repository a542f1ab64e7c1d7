from .mesh import (
    auto_mesh,
    batch_sharding,
    create_mesh,
    fsdp_param_specs,
    replicated,
    shard_batch,
    shard_params,
)
from .multihost import global_batch, host_local_slice, initialize, launched_by_env
from .tp import spatial_sharding, tp_param_specs, tp_shard_params
