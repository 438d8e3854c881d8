"""Undistortion as a precomputed remap grid + bilinear gather.

TPU-native equivalent of aslam's ``MappedUndistorter`` (built once at
``stereo.cpp:29-31`` and ``ortho-forward-homography.cc:28-29`` with
alpha = scale = 1.0, i.e. the output camera keeps the input K). The map is
built once per camera — for every *undistorted* pixel we run the forward
distortion model to find its source in the distorted image — then every frame
is a single dense ``remap`` gather on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.camera.models import Camera, distort
from aerial_mapper_tpu.image.sample import remap


@functools.lru_cache(maxsize=16)
def build_undistort_map(cam: Camera):
    """Return (map_u, map_v) [H, W] float32 device arrays.

    map_*[i, j] = distorted-image pixel that undistorted pixel (j, i) samples.
    Cached per camera (Camera is a hashable NamedTuple of scalars).
    """

    @jax.jit
    def _build():
        v = jax.lax.broadcasted_iota(jnp.float32, (cam.height, cam.width), 0)
        u = jax.lax.broadcasted_iota(jnp.float32, (cam.height, cam.width), 1)
        xn = (u - cam.cx) / cam.fx
        yn = (v - cam.cy) / cam.fy
        xy_d = distort(cam, jnp.stack([xn, yn], axis=-1))
        map_u = cam.fx * xy_d[..., 0] + cam.cx
        map_v = cam.fy * xy_d[..., 1] + cam.cy
        return map_u, map_v

    return _build()


def undistort_image(cam: Camera, image: jax.Array) -> jax.Array:
    """Undistort one [H, W(, C)] image (bilinear, border = 0)."""
    if cam.dist_kind == "none":
        return image
    map_u, map_v = build_undistort_map(cam)
    return remap(image, map_u, map_v, fill_value=0.0)
