from .mesh import (
    ShardingReport,
    data_sharding,
    make_mesh,
    replicate,
    shard_params,
)
