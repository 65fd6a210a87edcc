from usv_tpu.parallel.mesh import (
    make_env_mesh,
    shard_env_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)
from usv_tpu.parallel.dist import initialize_distributed, fold_host_key
