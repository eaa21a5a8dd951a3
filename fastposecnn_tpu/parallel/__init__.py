from fastposecnn_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_multislice_mesh,
    replicate,
    shard_batch,
    shard_batch_multihost,
    shard_state_tp,
)
