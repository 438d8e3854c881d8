from aerial_mapper_tpu.pipeline.dataset import Dataset, load_dataset  # noqa: F401
from aerial_mapper_tpu.pipeline.batch import (  # noqa: F401
    run_dense_pcl,
    run_dsm,
    run_ortho_backward_grid,
    run_ortho_forward_homography,
    run_ortho_from_pcl,
)
from aerial_mapper_tpu.pipeline.incremental import run_incremental  # noqa: F401
