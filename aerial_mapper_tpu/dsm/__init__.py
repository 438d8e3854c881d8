from aerial_mapper_tpu.dsm.idw import (  # noqa: F401
    bin_points,
    binned_idw,
    update_elevation_layer,
)
