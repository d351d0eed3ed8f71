from s2v_tpu.parallel.context import constrain, mesh_context, active_mesh  # noqa: F401
from s2v_tpu.parallel.multihost import initialize_distributed, make_hybrid_mesh  # noqa: F401
from s2v_tpu.parallel.sharding import (  # noqa: F401
    default_logical_map,
    make_mesh,
    replicate,
    shard_params,
    transformer_param_specs,
)
