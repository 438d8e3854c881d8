from aerial_mapper_tpu.features.detect import detect_corners  # noqa: F401
from aerial_mapper_tpu.features.describe import describe_patches  # noqa: F401
from aerial_mapper_tpu.features.match import match_descriptors  # noqa: F401
from aerial_mapper_tpu.features.tracks import (  # noqa: F401
    build_tracks,
    triangulate_tracks,
)
from aerial_mapper_tpu.features.refine import (  # noqa: F401
    refine_poses,
    refine_poses_windowed,
)
