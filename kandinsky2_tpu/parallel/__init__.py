from .mesh import (
    ShardingReport,
    data_sharding,
    make_mesh,
    replicate,
    shard_params,
)
from .spatial import (
    halo_below_rows,
    halo_exchange_rows,
    sp_attention_rows,
    spatial_decode,
    spatial_encode,
)
