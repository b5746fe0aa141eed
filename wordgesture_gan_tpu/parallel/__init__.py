from .mesh import batch_sharding, create_mesh, packed_replicate, replicate, replicated, shard_batch
