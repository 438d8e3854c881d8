from aerial_mapper_tpu.geo import se3, utm  # noqa: F401
from aerial_mapper_tpu.geo.se3 import (  # noqa: F401
    quat_identity,
    quat_normalize,
    quat_multiply,
    quat_conjugate,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    quat_from_axis_angle,
    Pose,
    pose_identity,
    pose_compose,
    pose_inverse,
    pose_transform,
    pose_rotation_matrix,
)
