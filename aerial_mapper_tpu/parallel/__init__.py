from aerial_mapper_tpu.parallel.mesh import make_mesh  # noqa: F401
from aerial_mapper_tpu.parallel.halo import (  # noqa: F401
    halo_exchange_extended,
    halo_exchange_rows,
)
from aerial_mapper_tpu.parallel.sharded import (  # noqa: F401
    BandedImages,
    RingPairOperands,
    band_image_operands,
    prepare_ring_pair_operands,
    sharded_backward_grid_update,
    sharded_dsm_update,
    sharded_map_step,
)
