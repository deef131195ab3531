from .sharding import (
    cache_sharding,
    make_mesh,
    shard_cache,
    shard_params,
    shard_params_stacked,
    token_sharding,
)

__all__ = ["cache_sharding", "make_mesh", "shard_cache", "shard_params", "shard_params_stacked",
           "token_sharding"]
