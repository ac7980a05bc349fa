from video_vae_tpu.parallel.mesh import build_mesh, mesh_from_config  # noqa: F401
from video_vae_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    constrain,
    param_shardings,
    replicated,
    shard_state,
    shard_process_local_batch,
)
