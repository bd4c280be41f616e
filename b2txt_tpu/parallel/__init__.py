from .mesh import (
    batch_partition_specs,
    make_mesh,
    named_sharding_tree,
    param_partition_specs,
    shard_params,
)
from .dp import build_sharded_forward, build_sharded_train_step
