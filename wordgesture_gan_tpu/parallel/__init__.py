from .distributed import (
    distributed_env_requested,
    maybe_init_distributed,
    process_local_batch_slice,
)
from .mesh import (
    batch_sharding,
    create_mesh,
    global_replicate,
    global_shard,
    packed_replicate,
    replicate,
    replicated,
    shard_batch,
)
