"""Synthetic aerial survey generator: analytic terrain + procedural texture.

Stands in for the reference's downloadable "cadastre" sample dataset
(``install/test_aerial_mapper:20-23`` fetches it from timohinzmann.com; this
sandbox has no egress). Because both the heightfield and the texture are
analytic functions of (easting, northing), every pipeline stage has exact
ground truth: DSM RMSE and ortho parity are measured against closed forms,
satisfying BASELINE.json's "DSM RMSE within 1 cell" acceptance check.

The renderer ray-casts each pixel against the heightfield with a fixed-point
iteration (terrain slope << 1 for aerial scenes, so it converges in a few
steps) — fully jitted, so generating a 249-image sequence is itself a TPU
workload.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.camera.models import Camera


@dataclasses.dataclass(frozen=True)
class SyntheticScene:
    """Analytic terrain z(e, n) and texture t(e, n) in [0, 255]."""

    base_elevation: float = 414.0  # rafz-like ground elevation
    relief_amplitude: float = 6.0
    texture_scale: float = 1.0

    def height(self, e, n):
        """Smooth heightfield; max slope ~ relief_amplitude * 0.05."""
        a = self.relief_amplitude
        return (
            self.base_elevation
            + a * jnp.sin(0.020 * e) * jnp.cos(0.017 * n)
            + 0.6 * a * jnp.sin(0.051 * e + 1.3) * jnp.sin(0.043 * n + 0.7)
            + 0.25 * a * jnp.cos(0.11 * e - 0.4) * jnp.sin(0.089 * n + 2.1)
        )

    def texture(self, e, n):
        """Multi-octave procedural intensity in [0, 255] with detail at all
        scales down to ~0.5 m (enough gradient for block matching)."""
        s = self.texture_scale
        v = (
            0.45 * jnp.sin(0.31 * s * e + 0.2) * jnp.cos(0.27 * s * n + 1.1)
            + 0.30 * jnp.sin(0.83 * s * e + 2.9) * jnp.sin(0.91 * s * n + 0.5)
            + 0.15 * jnp.cos(2.11 * s * e + 1.7) * jnp.sin(1.87 * s * n + 2.3)
            + 0.10 * jnp.sin(4.97 * s * e + 0.9) * jnp.cos(5.31 * s * n + 1.9)
        )
        # checker-like cadastre field boundaries at 25 m spacing
        fields = 0.18 * jnp.sign(jnp.sin(0.04 * 3.1415 * e) * jnp.sin(
            0.04 * 3.1415 * n))
        return 127.5 + 127.5 * jnp.clip(0.75 * v + fields, -1.0, 1.0) * 0.9

    def texture_rgb(self, e, n):
        """[..., 3] RGB in [0, 255]: the gray texture tinted by a smooth
        field-dependent hue, so color carries independent information
        (G/B differ from R by analytic, testable factors)."""
        t = self.texture(e, n)
        hue = 0.5 + 0.5 * jnp.sin(0.013 * e + 0.7) * jnp.cos(0.011 * n)
        r = t
        g = t * (0.55 + 0.35 * hue)
        b = t * (0.90 - 0.50 * hue)
        return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


@partial(jax.jit, static_argnames=("scene", "cam", "apply_distortion",
                                   "color"))
def render_image(
    scene: SyntheticScene,
    cam: Camera,
    R_G_C: jax.Array,  # [3, 3] camera-to-world rotation (columns = axes)
    t_G_C: jax.Array,  # [3] camera position (origin-subtracted world frame)
    apply_distortion: bool = False,
    color: bool = False,
) -> jax.Array:
    """Render one [H, W] grayscale ([H, W, 3] RGB with ``color``) image by
    heightfield ray casting.

    When ``apply_distortion`` the output is what a *distorted* lens would
    capture (so the undistortion path can be exercised).
    """
    h, w = cam.height, cam.width
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xn = (u - cam.cx) / cam.fx
    yn = (v - cam.cy) / cam.fy
    xy = jnp.stack([xn, yn], axis=-1)
    if apply_distortion:
        # pixel (u, v) of the distorted image looks along the ray whose
        # *distorted* projection lands at (u, v): invert the model.
        from aerial_mapper_tpu.camera.models import undistort_points

        xy = undistort_points(cam, xy)
    d_cam = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    d_world = jnp.einsum(
        "ij,hwj->hwi", R_G_C, d_cam, precision=jax.lax.Precision.HIGHEST
    )

    o = t_G_C
    dz = d_world[..., 2]
    dz = jnp.where(jnp.abs(dz) < 1e-6, -1e-6, dz)

    # Fixed-point: s = (h(xy(s)) - o_z) / d_z, init with base elevation.
    def body(_, s):
        e = o[0] + s * d_world[..., 0]
        n = o[1] + s * d_world[..., 1]
        return (scene.height(e, n) - o[2]) / dz

    s0 = (scene.base_elevation - o[2]) / dz
    s = jax.lax.fori_loop(0, 8, body, s0)

    e = o[0] + s * d_world[..., 0]
    n = o[1] + s * d_world[..., 1]
    if color:
        img = scene.texture_rgb(e, n)
        return jnp.where(s[..., None] > 0, img, 0.0)
    img = scene.texture(e, n)
    # rays that never hit (looking up) -> 0
    return jnp.where(s > 0, img, 0.0)


def make_survey_poses(
    num_images: int,
    altitude: float = 514.0,
    spacing: float = 6.0,
    num_lines: int = 1,
    line_spacing: float = 60.0,
    start_easting: float = 0.0,
    start_northing: float = 0.0,
    jitter: float = 0.0,
    seed: int = 0,
):
    """Nadir survey trajectory: camera z down, x along flight direction.

    Returns (R_G_Cs [N, 3, 3], t_G_Cs [N, 3]) float64. Lawn-mower pattern
    with ``num_lines`` parallel lines.
    """
    rng = np.random.default_rng(seed)
    per_line = int(np.ceil(num_images / num_lines))
    Rs, ts = [], []
    for i in range(num_images):
        line = i // per_line
        k = i % per_line
        if line % 2 == 0:
            e = start_easting + k * spacing
        else:
            e = start_easting + (per_line - 1 - k) * spacing
        n = start_northing + line * line_spacing
        t = np.array([e, n, altitude], dtype=np.float64)
        if jitter > 0:
            t += rng.normal(scale=jitter, size=3)
        # nadir: camera x = east(flight), y = -north, z = down
        R = np.array(
            [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]
        )
        if jitter > 0:
            # small attitude perturbation
            ang = rng.normal(scale=0.01, size=3)
            cx, cy, cz = np.cos(ang)
            sx, sy, sz = np.sin(ang)
            Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            R = R @ Rx @ Ry @ Rz
        Rs.append(R)
        ts.append(t)
    return np.asarray(Rs), np.asarray(ts)
