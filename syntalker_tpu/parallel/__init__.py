from syntalker_tpu.parallel.mesh import (  # noqa: F401
    MDM_TP_LAYOUT,
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
    replicate,
)
