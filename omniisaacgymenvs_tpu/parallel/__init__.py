from omniisaacgymenvs_tpu.parallel.mesh import (
    env_mesh,
    env_sharding,
    replicated_sharding,
    shard_env_tree,
)
