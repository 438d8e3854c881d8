"""SO(3)/SE(3) as (quaternion, translation) arrays with vmappable ops.

TPU-native replacement for the reference's minkindr
``kindr::minimal::QuatTransformation`` pose type (used throughout, e.g.
``aerial_mapper_ortho/src/ortho-backward-grid.cc:66-68,230-233``). Instead of
an object per pose we carry batched ``[..., 4]`` quaternions (w, x, y, z —
matching the reference's Standard pose text format ``x y z qw qx qy qz``,
``aerial_mapper_io/src/aerial-mapper-io.cc:103-121``) and ``[..., 3]``
translations, so whole trajectories transform in one fused XLA op.

All functions are shape-polymorphic over leading batch dimensions and work
under jit/vmap/grad. Host-side loading keeps float64; device code runs
float32 after origin subtraction (see SURVEY.md §7.3 on f64 georeferencing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, wxyz convention. Supports broadcasting."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors ``v`` [..., 3] by quaternions ``q`` [..., 4].

    Uses the expanded Rodrigues form (2 cross products) — cheaper and more
    vectorization-friendly than forming rotation matrices.
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """[..., 4] quaternion -> [..., 3, 3] rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation matrix -> [..., 4] wxyz quaternion (w >= 0).

    Branch-free Shepperd's method: computes all four candidate quaternions
    and selects the numerically best one with ``where`` masks so it traces
    to static control flow.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q_i^2 values.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # Candidate quaternions from each pivot.
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    pivots = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([cw, cx, cy, cz], axis=-2)  # [..., 4(pivot), 4(quat)]
    q = jnp.take_along_axis(cand, best[..., None, None], axis=-2)[..., 0, :]
    scale = 0.5 / safe_sqrt(jnp.take_along_axis(pivots, best[..., None], axis=-1))
    q = q * scale
    # Canonicalize sign: w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


class Pose(NamedTuple):
    """Batched SE(3) transform T_A_B: x_A = R(q) x_B + t.

    ``q``: [..., 4] wxyz quaternion, ``t``: [..., 3] translation.
    """

    q: jax.Array
    t: jax.Array

    @property
    def batch_shape(self):
        return self.q.shape[:-1]

    def __matmul__(self, other: "Pose") -> "Pose":
        return pose_compose(self, other)


def pose_identity(batch_shape=(), dtype=jnp.float32) -> Pose:
    q = jnp.broadcast_to(quat_identity(dtype), batch_shape + (4,))
    t = jnp.zeros(batch_shape + (3,), dtype)
    return Pose(q, t)


def pose_compose(a: Pose, b: Pose) -> Pose:
    """T_A_C = T_A_B * T_B_C."""
    return Pose(
        q=quat_normalize(quat_multiply(a.q, b.q)),
        t=a.t + quat_rotate(a.q, b.t),
    )


def pose_inverse(p: Pose) -> Pose:
    q_inv = quat_conjugate(p.q)
    return Pose(q=q_inv, t=-quat_rotate(q_inv, p.t))


def pose_transform(p: Pose, x: jax.Array) -> jax.Array:
    """Apply T to points ``x`` [..., 3] (broadcasts over batch dims)."""
    return quat_rotate(p.q, x) + p.t


def pose_rotation_matrix(p: Pose) -> jax.Array:
    return quat_to_matrix(p.q)
