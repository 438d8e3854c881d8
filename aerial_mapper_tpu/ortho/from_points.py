"""Ortho backend C: orthomosaic by IDW of point intensities.

Mirrors ``ortho::OrthoFromPcl::process`` (``aerial_mapper_ortho/src/
ortho-from-pcl.cc:20-113``): identical machinery to the DSM rasterizer but
the interpolated payload is per-point pixel intensity. Reuses the
grid-binned IDW kernel (aerial_mapper_tpu.dsm.idw), which documents the
squared-distance-unit and adaptive-growth parity notes.
"""

from aerial_mapper_tpu.dsm.idw import ortho_from_points  # noqa: F401
