from cvcs_tpu.core.mesh import (  # noqa: F401
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicate,
    shard_batch,
    local_mesh,
)
from cvcs_tpu.core.precision import Policy, DEFAULT_POLICY  # noqa: F401
