from aerial_mapper_tpu.io.poses import (  # noqa: F401
    PoseFormat,
    load_poses,
    save_poses_standard,
    subtract_origin,
)
from aerial_mapper_tpu.io.images import (  # noqa: F401
    load_images_by_prefix,
    load_images_by_names,
    save_image,
)
from aerial_mapper_tpu.io.pointcloud import (  # noqa: F401
    load_point_cloud_txt,
    save_point_cloud_txt,
)
from aerial_mapper_tpu.io.geotiff import write_geotiff, read_geotiff  # noqa: F401
from aerial_mapper_tpu.io.artifacts import (  # noqa: F401
    load_layers,
    load_points,
    save_layers,
    save_points,
)
