from .sharding import (
    make_mesh,
    param_partition_specs,
    repack_params_for_tp,
    shard_params,
    make_tp_forward,
)
