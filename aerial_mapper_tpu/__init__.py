"""aerial_mapper_tpu — a TPU-native aerial reconstruction engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
ethz-asl/aerial_mapper (reference layout documented in /root/repo/SURVEY.md):

- georeferenced pose/image ingestion (Standard / PIX4D / COLMAP formats)
- virtual-stereo planar rectification -> dense point clouds
  (batched Fusiello rectification + cost-volume block matching / semi-global
  matching expressed as `lax.scan`s, replacing OpenCV StereoBM/SGBM)
- digital surface models via grid-binned inverse-distance weighting
  (replacing the reference's nanoflann kd-tree radius searches,
  `aerial_mapper_dsm/src/dsm.cc:36-111`)
- orthomosaic backends: backward-grid best-angle texturing, forward
  homography warping with feather blending, and ortho-from-points IDW
- windowed bundle adjustment (Gauss-Newton + Schur complement) — an
  extension beyond the reference, which assumes pre-optimized poses
- multi-device scaling via `jax.sharding.Mesh` + `shard_map`: map tiles
  sharded with halo exchange, stereo pairs sharded ring-style

Everything on the compute path is functional JAX traced under `jit` with
static shapes; host-side I/O (GeoTiff, pose files, image decode) stays in
plain Python/C++.
"""

__version__ = "0.1.0"

from aerial_mapper_tpu import config  # noqa: F401
