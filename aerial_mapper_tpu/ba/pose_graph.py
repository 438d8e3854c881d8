"""Pose-graph optimization: relative-pose constraints on SE(3).

North-star extension alongside bundle adjustment (SURVEY.md §7.2 step 7):
smooth a trajectory against odometry/loop-closure style constraints

    r_ij = [ Log(R_ij_meas^T R_i^T R_j),  R_i^T (t_j - t_i) - t_ij_meas ]

with Gauss-Newton. TPU shape: residuals and Jacobians are vmapped autodiff
over the edge array (same pattern as ba/bundle_adjust), the normal equations
are assembled with ``segment_sum`` scatter over the [6N, 6N] system — dense
solve for the windowed sizes this targets (hundreds of poses), with the
first pose anchored.

Useful standalone (smoothing PIX4D trajectories between BA windows) and as
the chaining layer between windowed BA segments.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.ba.bundle_adjust import _apply_cam_delta, _exp_quat
from aerial_mapper_tpu.geo.se3 import (
    quat_conjugate,
    quat_multiply,
    quat_rotate,
)


class PoseGraph(NamedTuple):
    """Edges i->j with measured relative transforms (in i's frame)."""

    idx_i: jax.Array  # [E] int32
    idx_j: jax.Array  # [E] int32
    rel_q: jax.Array  # [E, 4] measured q_i_j (wxyz)
    rel_t: jax.Array  # [E, 3] measured t_i_j
    weight_rot: jax.Array  # [E]
    weight_trans: jax.Array  # [E]


def _log_quat(q: jax.Array) -> jax.Array:
    """Quaternion -> rotation vector, differentiable at identity."""
    q = q * jnp.sign(q[..., :1] + 1e-30)  # hemisphere
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    s2 = jnp.sum(v * v, axis=-1)
    small = s2 < 1e-12
    s = jnp.sqrt(jnp.where(small, 1.0, s2))
    angle_over_s = jnp.where(
        small,
        2.0 / jnp.maximum(w, 1e-6) * (1.0 + s2 / (6.0 * jnp.maximum(w, 1e-6) ** 2)),
        2.0 * jnp.arctan2(s, w) / s,
    )
    return v * angle_over_s[..., None]


def _edge_residual(qi, ti, qj, tj, rel_q, rel_t, w_rot, w_trans):
    """[6] weighted residual of one edge."""
    q_ij = quat_multiply(quat_conjugate(qi), qj)  # estimated relative rot
    t_ij = quat_rotate(quat_conjugate(qi), tj - ti)
    r_rot = _log_quat(quat_multiply(quat_conjugate(rel_q), q_ij))
    r_trans = t_ij - rel_t
    return jnp.concatenate([w_rot * r_rot, w_trans * r_trans])


def relative_pose(quats, trans, i, j):
    """Measured-style relative transform between two absolute poses."""
    q_ij = quat_multiply(quat_conjugate(quats[i]), quats[j])
    t_ij = quat_rotate(quat_conjugate(quats[i]), trans[j] - trans[i])
    return q_ij, t_ij


@partial(jax.jit, static_argnames=("num_iterations", "fix_first"))
def optimize_pose_graph(
    quats: jax.Array,  # [N, 4] initial absolute poses
    trans: jax.Array,  # [N, 3]
    graph: PoseGraph,
    num_iterations: int = 10,
    damping: float = 1e-6,
    fix_first: bool = True,
):
    """Gauss-Newton over the pose graph; returns (quats, trans)."""
    n = quats.shape[0]

    def gn_iter(carry, _):
        q, t = carry

        def res_of(d_i, d_j, qi, ti, qj, tj, rq, rt, wr, wt):
            qi2, ti2 = _apply_cam_delta(qi, ti, d_i)
            qj2, tj2 = _apply_cam_delta(qj, tj, d_j)
            return _edge_residual(qi2, ti2, qj2, tj2, rq, rt, wr, wt)

        qi = q[graph.idx_i]
        ti = t[graph.idx_i]
        qj = q[graph.idx_j]
        tj = t[graph.idx_j]
        zeros6 = jnp.zeros((qi.shape[0], 6), q.dtype)

        res = jax.vmap(res_of)(
            zeros6, zeros6, qi, ti, qj, tj, graph.rel_q, graph.rel_t,
            graph.weight_rot, graph.weight_trans,
        )
        j_i = jax.vmap(jax.jacfwd(res_of, argnums=0))(
            zeros6, zeros6, qi, ti, qj, tj, graph.rel_q, graph.rel_t,
            graph.weight_rot, graph.weight_trans,
        )
        j_j = jax.vmap(jax.jacfwd(res_of, argnums=1))(
            zeros6, zeros6, qi, ti, qj, tj, graph.rel_q, graph.rel_t,
            graph.weight_rot, graph.weight_trans,
        )

        # assemble H [N, 6, N, 6] sparsely via scatter of 6x6 blocks
        h_ii = jnp.einsum("eri,erj->eij", j_i, j_i)
        h_jj = jnp.einsum("eri,erj->eij", j_j, j_j)
        h_ij = jnp.einsum("eri,erj->eij", j_i, j_j)
        b_i = -jnp.einsum("eri,er->ei", j_i, res)
        b_j = -jnp.einsum("eri,er->ei", j_j, res)

        H = jnp.zeros((n, 6, n, 6), q.dtype)
        H = H.at[graph.idx_i, :, graph.idx_i, :].add(h_ii)
        H = H.at[graph.idx_j, :, graph.idx_j, :].add(h_jj)
        H = H.at[graph.idx_i, :, graph.idx_j, :].add(h_ij)
        H = H.at[graph.idx_j, :, graph.idx_i, :].add(
            jnp.swapaxes(h_ij, 1, 2)
        )
        b = jnp.zeros((n, 6), q.dtype)
        b = b.at[graph.idx_i].add(b_i)
        b = b.at[graph.idx_j].add(b_j)

        H = H.reshape(6 * n, 6 * n) + damping * jnp.eye(6 * n, dtype=q.dtype)
        b = b.reshape(6 * n)
        if fix_first:
            # anchor pose 0: zero its rows/cols, identity diagonal
            m = jnp.arange(6 * n) >= 6
            H = jnp.where(m[:, None] & m[None, :], H,
                          jnp.eye(6 * n, dtype=q.dtype))
            b = jnp.where(m, b, 0.0)

        delta = jnp.linalg.solve(H, b).reshape(n, 6)
        q2, t2 = _apply_cam_delta(q, t, delta)
        return (q2, t2), jnp.sum(res * res)

    (q_out, t_out), costs = jax.lax.scan(
        gn_iter, (quats, trans), None, length=num_iterations
    )
    return q_out, t_out, costs


def build_sequential_graph(quats, trans, odometry_sigma_rot=0.01,
                           odometry_sigma_trans=0.1, extra_edges=()):
    """Odometry chain edges (i, i+1) from the given trajectory + optional
    loop-closure edges [(i, j, rel_q, rel_t, w_rot, w_trans), ...]."""
    import numpy as np

    n = quats.shape[0]
    idx_i, idx_j, rqs, rts, wr, wt = [], [], [], [], [], []
    for i in range(n - 1):
        rq, rt = relative_pose(jnp.asarray(quats), jnp.asarray(trans), i,
                               i + 1)
        idx_i.append(i)
        idx_j.append(i + 1)
        rqs.append(np.asarray(rq))
        rts.append(np.asarray(rt))
        wr.append(1.0 / odometry_sigma_rot)
        wt.append(1.0 / odometry_sigma_trans)
    for (i, j, rq, rt, w_r, w_t) in extra_edges:
        idx_i.append(i)
        idx_j.append(j)
        rqs.append(np.asarray(rq))
        rts.append(np.asarray(rt))
        wr.append(w_r)
        wt.append(w_t)
    return PoseGraph(
        idx_i=jnp.asarray(np.asarray(idx_i), jnp.int32),
        idx_j=jnp.asarray(np.asarray(idx_j), jnp.int32),
        rel_q=jnp.asarray(np.stack(rqs), jnp.float32),
        rel_t=jnp.asarray(np.stack(rts), jnp.float32),
        weight_rot=jnp.asarray(np.asarray(wr), jnp.float32),
        weight_trans=jnp.asarray(np.asarray(wt), jnp.float32),
    )
