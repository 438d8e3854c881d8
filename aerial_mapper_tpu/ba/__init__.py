from aerial_mapper_tpu.ba.bundle_adjust import (  # noqa: F401
    sharded_bundle_adjust,
    BAProblem,
    BAState,
    bundle_adjust,
    reprojection_residuals,
)
from aerial_mapper_tpu.ba.pose_graph import (  # noqa: F401
    PoseGraph,
    build_sequential_graph,
    optimize_pose_graph,
    relative_pose,
)
