"""Batched pinhole camera with radial-tangential / equidistant distortion.

TPU-native replacement for aslam_cv2's ``PinholeCamera::project3`` /
``backProject3`` / ``ProjectionResult`` machinery used by the reference
(``aerial_mapper_ortho/src/ortho-backward-grid.cc:66-81``,
``.../ortho-forward-homography.cc:88-90``). Instead of virtual dispatch per
point we carry a static distortion kind and vectorize the closed forms over
arbitrary batch shapes, so projecting every map cell into every camera is one
fused XLA op feeding the MXU/VPU.

Projection status is returned as a mask rather than an enum: a point is
"visible" iff it projects inside the image and is in front of the camera —
the exact check at ``ortho-backward-grid.cc:74-81``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

DIST_NONE = "none"
DIST_RADTAN = "radial-tangential"
DIST_EQUIDISTANT = "equidistant"

_UNDISTORT_ITERS = 12  # fixed-point iterations for the inverse distortion


class Camera(NamedTuple):
    """Pinhole intrinsics. ``dist_params`` is always length 4 (zero padded).

    ``dist_kind`` is a static Python string — jit treats it as a constant, so
    each distortion model compiles to straight-line code with no dispatch.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    dist_kind: str = DIST_NONE
    dist_params: tuple = (0.0, 0.0, 0.0, 0.0)

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float64,
        )

    def scaled(self, s: float) -> "Camera":
        return self._replace(
            fx=self.fx * s,
            fy=self.fy * s,
            cx=self.cx * s,
            cy=self.cy * s,
            width=int(round(self.width * s)),
            height=int(round(self.height * s)),
        )


def distort(cam: Camera, xy: jax.Array) -> jax.Array:
    """Apply the distortion model to normalized image coords ``xy`` [..., 2]."""
    x, y = xy[..., 0], xy[..., 1]
    if cam.dist_kind == DIST_NONE:
        return xy
    k = jnp.asarray(cam.dist_params, dtype=xy.dtype)
    if cam.dist_kind == DIST_RADTAN:
        k1, k2, p1, p2 = k[0], k[1], k[2], k[3]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], axis=-1)
    if cam.dist_kind == DIST_EQUIDISTANT:
        k1, k2, k3, k4 = k[0], k[1], k[2], k[3]
        r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-24))
        theta = jnp.arctan(r)
        t2 = theta * theta
        theta_d = theta * (1.0 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
        scale = theta_d / r
        return xy * scale[..., None]
    raise ValueError(f"Unknown distortion kind: {cam.dist_kind}")


def undistort_points(cam: Camera, xy_dist: jax.Array) -> jax.Array:
    """Invert ``distort`` on normalized coords via fixed-point iteration.

    ``lax.fori_loop`` keeps the trace compact; _UNDISTORT_ITERS iterations
    converge well below 1e-6 normalized units for aerial-lens distortion
    magnitudes.
    """
    if cam.dist_kind == DIST_NONE:
        return xy_dist

    if cam.dist_kind == DIST_RADTAN:

        def body(_, xy):
            # x_d = x * radial(x) + tang(x)  =>  x = (x_d - tang(x)) / radial(x)
            x, y = xy[..., 0], xy[..., 1]
            k = jnp.asarray(cam.dist_params, dtype=xy.dtype)
            k1, k2, p1, p2 = k[0], k[1], k[2], k[3]
            r2 = x * x + y * y
            radial = 1.0 + k1 * r2 + k2 * r2 * r2
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
            xn = (xy_dist[..., 0] - dx) / radial
            yn = (xy_dist[..., 1] - dy) / radial
            return jnp.stack([xn, yn], axis=-1)

        return jax.lax.fori_loop(0, _UNDISTORT_ITERS, body, xy_dist)

    if cam.dist_kind == DIST_EQUIDISTANT:
        # theta_d = theta * poly(theta^2) with theta_d = |xy_d|; solve for
        # theta by the standard fisheye fixed point theta <- theta_d / poly,
        # then r = tan(theta).
        r_d = jnp.sqrt(
            jnp.maximum(xy_dist[..., 0] ** 2 + xy_dist[..., 1] ** 2, 1e-24)
        )
        k = jnp.asarray(cam.dist_params, dtype=xy_dist.dtype)

        def body(_, theta):
            t2 = theta * theta
            poly = 1.0 + k[0] * t2 + k[1] * t2**2 + k[2] * t2**3 + k[3] * t2**4
            return r_d / jnp.maximum(poly, 1e-6)

        theta = jax.lax.fori_loop(0, _UNDISTORT_ITERS, body, r_d)
        scale = jnp.tan(theta) / r_d
        return xy_dist * scale[..., None]

    raise ValueError(f"Unknown distortion kind: {cam.dist_kind}")


def project(cam: Camera, points_c: jax.Array):
    """Project camera-frame points [..., 3] -> pixel coords [..., 2] + mask.

    Returns ``(uv, visible)`` where ``visible`` replicates the reference's
    keypoint-visibility predicate (in-bounds AND z > 0,
    ``ortho-backward-grid.cc:74-81``).
    """
    z = points_c[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xy = points_c[..., :2] / safe_z[..., None]
    xy_d = distort(cam, xy)
    u = cam.fx * xy_d[..., 0] + cam.cx
    v = cam.fy * xy_d[..., 1] + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    visible = (
        (z > 1e-6)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u < cam.width)
        & (v < cam.height)
        & jnp.isfinite(u)
        & jnp.isfinite(v)
    )
    return uv, visible


def back_project(cam: Camera, uv: jax.Array) -> jax.Array:
    """Pixel coords [..., 2] -> unit-norm camera-frame rays [..., 3].

    Matches aslam's ``backProject3`` semantics (used for the ground-plane
    intersection at ``ortho-forward-homography.cc:88-96``).
    """
    xn = (uv[..., 0] - cam.cx) / cam.fx
    yn = (uv[..., 1] - cam.cy) / cam.fy
    xy = undistort_points(cam, jnp.stack([xn, yn], axis=-1))
    ray = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
