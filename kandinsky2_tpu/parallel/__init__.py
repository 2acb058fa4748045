from .mesh import (
    ShardingReport,
    data_sharding,
    fsdp_state_shardings,
    make_mesh,
    replicate,
    shard_params,
    shard_pipeline,
)
from .spatial import (
    halo_below_rows,
    halo_exchange_rows,
    sp_attention_rows,
    spatial_decode,
    spatial_encode,
)
