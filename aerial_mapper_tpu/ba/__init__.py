from aerial_mapper_tpu.ba.bundle_adjust import (  # noqa: F401
    sharded_bundle_adjust,
    BAProblem,
    BAState,
    bundle_adjust,
    reprojection_residuals,
)
