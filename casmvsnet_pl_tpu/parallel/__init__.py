from .mesh import (batch_sharding, initialize_distributed, make_mesh,
                   replicated_sharding, shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "initialize_distributed"]
