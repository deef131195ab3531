from .sharding import (
    cache_sharding,
    make_mesh,
    shard_cache,
    shard_params,
    token_sharding,
)

__all__ = ["cache_sharding", "make_mesh", "shard_cache", "shard_params",
           "token_sharding"]
