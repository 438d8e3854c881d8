from aerial_mapper_tpu.parallel.mesh import make_mesh  # noqa: F401
from aerial_mapper_tpu.parallel.halo import halo_exchange_rows  # noqa: F401
from aerial_mapper_tpu.parallel.sharded import (  # noqa: F401
    sharded_backward_grid_update,
    sharded_dsm_update,
    sharded_map_step,
)
