from .expert import ep_moe_ffn, make_ep_moe
from .multihost import global_mesh, init_multihost
from .pipeline import make_pp_forward, shard_params_pp
from .router import ReplicaRouter
from .sharding import (
    make_mesh,
    make_tp_forward,
    param_partition_specs,
    repack_params_for_tp,
    shard_params,
)
