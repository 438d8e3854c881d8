from aerial_mapper_tpu.stereo.rectify import (  # noqa: F401
    RectifiedPair,
    rectification_transforms,
    rectify_pair,
)
from aerial_mapper_tpu.stereo.matching import (  # noqa: F401
    block_matching_disparity,
    sgm_disparity,
)
from aerial_mapper_tpu.stereo.triangulate import triangulate_disparity  # noqa: F401
from aerial_mapper_tpu.stereo.pipeline import VirtualStereo  # noqa: F401
