from .mesh import make_mesh, shard_params, data_sharding, replicate
