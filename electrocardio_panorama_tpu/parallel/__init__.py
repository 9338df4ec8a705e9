from electrocardio_panorama_tpu.parallel.mesh import (
    batch_sharded,
    make_mesh,
    put_batch,
    put_replicated,
    replicated,
)
from electrocardio_panorama_tpu.parallel.sharding import (
    build_3d_train_step,
    build_dp_train_step,
    build_lead_parallel_panorama,
    build_sharded_panorama,
    lead_param_specs,
    opt_state_specs,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "put_replicated",
    "put_batch",
    "build_3d_train_step",
    "build_dp_train_step",
    "build_lead_parallel_panorama",
    "build_sharded_panorama",
    "lead_param_specs",
    "opt_state_specs",
]
