from aerial_mapper_tpu.camera.models import (  # noqa: F401
    Camera,
    DIST_NONE,
    DIST_RADTAN,
    DIST_EQUIDISTANT,
    project,
    back_project,
    distort,
    undistort_points,
)
from aerial_mapper_tpu.camera.undistort import (  # noqa: F401
    build_undistort_map,
    undistort_image,
)
from aerial_mapper_tpu.camera.rig import CameraRig, load_camera_rig  # noqa: F401
