"""Windowed bundle adjustment: Gauss-Newton with Schur complement on TPU.

The reference has NO bundle adjustment — it assumes pre-optimized PIX4D/
COLMAP trajectories (``/root/reference/README.md:5``; SURVEY.md §2.3). This
module is the north-star extension (BASELINE.json configs 4-5): refine
camera poses (and landmarks) by minimizing Huber-robust reprojection error
before rasterization.

TPU-first design:

- **Jacobians by autodiff**: the per-observation residual is differentiated
  with ``jax.jacfwd`` w.r.t. a 6-dof tangent increment (rotation-vector +
  translation) at zero and a 3-dof landmark increment — vmapped over all
  observations, so the whole Jacobian stack is one fused kernel, no
  hand-derived chain rules.
- **Matrix-free Schur complement**: the reduced camera system
  ``S = U - W V^-1 W^T`` is never formed. Its matvec decomposes into
  gathers + ``segment_sum``s over the observation array (O(M) per CG
  iteration), which is exactly the shape that distributes: shard
  observations across a mesh axis and ``psum`` the segment contributions
  (SURVEY.md §2.3 "distributed bundle adjustment via Schur complement ...
  psum collectives").
- **Levenberg-Marquardt damping + Huber IRLS** with static-shape iteration
  counts (``lax.scan``), so the whole optimizer jits once.

Gauge freedom is fixed by zeroing the first camera's update
(``cfg.fix_first_pose``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.camera.models import Camera
from aerial_mapper_tpu.config import BundleAdjustmentConfig
from aerial_mapper_tpu.geo.se3 import quat_multiply, quat_normalize, quat_rotate

_CG_ITERS = 40


class BAProblem(NamedTuple):
    """Observations: landmark ``lm_idx[k]`` seen by camera ``cam_idx[k]`` at
    pixel ``uv[k]``. Static shapes; invalid observations masked out."""

    cam_idx: jax.Array  # [M] int32
    lm_idx: jax.Array  # [M] int32
    uv: jax.Array  # [M, 2] float32
    valid: jax.Array  # [M] bool


class BAState(NamedTuple):
    quats: jax.Array  # [N, 4] camera-to-world (wxyz)
    trans: jax.Array  # [N, 3]
    landmarks: jax.Array  # [L, 3]


def _exp_quat(omega: jax.Array) -> jax.Array:
    """Rotation-vector [..., 3] -> quaternion (wxyz).

    Differentiable at omega = 0 (where BA evaluates the Jacobian): the
    norm's sqrt is guarded with the double-where trick and the w/sinc terms
    switch to their Taylor expansions, whose gradients at zero are exact.
    """
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = theta_sq < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    sinc_half = jnp.where(
        small, 0.5 - theta_sq / 48.0, jnp.sin(0.5 * theta) / theta
    )
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(0.5 * theta))
    return jnp.concatenate([w, omega * sinc_half], axis=-1)


def _apply_cam_delta(quat, t, delta6):
    """Right-perturbation: R' = R exp(w^), t' = t + dt."""
    dq = _exp_quat(delta6[..., :3])
    return quat_normalize(quat_multiply(quat, dq)), t + delta6[..., 3:]


def _project_residual(quat, t, lm, uv, cam: Camera):
    """Reprojection residual of one observation (camera-to-world pose)."""
    conj = quat * jnp.array([1.0, -1.0, -1.0, -1.0], quat.dtype)
    p_c = quat_rotate(conj, lm - t)
    z = jnp.maximum(p_c[2], 1e-6)
    from aerial_mapper_tpu.camera.models import distort

    xy = distort(cam, p_c[:2] / z)
    u = cam.fx * xy[0] + cam.cx
    v = cam.fy * xy[1] + cam.cy
    return jnp.stack([u - uv[0], v - uv[1]])


def reprojection_residuals(state: BAState, problem: BAProblem, cam: Camera):
    """[M, 2] residuals (masked observations -> 0)."""
    quats = state.quats[problem.cam_idx]
    trans = state.trans[problem.cam_idx]
    lms = state.landmarks[problem.lm_idx]
    res = jax.vmap(partial(_project_residual, cam=cam))(
        quats, trans, lms, problem.uv
    )
    return jnp.where(problem.valid[:, None], res, 0.0)


def _obs_jacobians(state: BAState, problem: BAProblem, cam: Camera):
    """Per-observation residual + Jacobians wrt camera tangent and landmark.

    Returns (res [M, 2], Jc [M, 2, 6], Jl [M, 2, 3]).
    """
    quats = state.quats[problem.cam_idx]
    trans = state.trans[problem.cam_idx]
    lms = state.landmarks[problem.lm_idx]

    def res_of(delta6, dlm, quat, t, lm, uv):
        q2, t2 = _apply_cam_delta(quat, t, delta6)
        return _project_residual(q2, t2, lm + dlm, uv, cam)

    zeros6 = jnp.zeros((quats.shape[0], 6), quats.dtype)
    zeros3 = jnp.zeros((quats.shape[0], 3), quats.dtype)

    res = jax.vmap(res_of)(zeros6, zeros3, quats, trans, lms, problem.uv)
    jc = jax.vmap(jax.jacfwd(res_of, argnums=0))(
        zeros6, zeros3, quats, trans, lms, problem.uv
    )
    jl = jax.vmap(jax.jacfwd(res_of, argnums=1))(
        zeros6, zeros3, quats, trans, lms, problem.uv
    )
    mask = problem.valid[:, None]
    return (
        jnp.where(mask, res, 0.0),
        jnp.where(mask[..., None], jc, 0.0),
        jnp.where(mask[..., None], jl, 0.0),
    )


def _huber_weights(res: jax.Array, delta: float,
                   gate: float = jnp.inf) -> jax.Array:
    """IRLS weights for the Huber loss, per observation [M].

    Residuals beyond ``gate`` get weight 0 (redescending outlier cut).
    """
    norm = jnp.linalg.norm(res, axis=-1)
    w = jnp.where(norm <= delta, 1.0, delta / jnp.maximum(norm, 1e-12))
    return jnp.where(norm <= gate, w, 0.0)


def _segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def _schur_solve(res, jc, jl, w_obs, problem: BAProblem, n_cams, n_lms,
                 damping, fix_first: bool, axis_name=None,
                 prior_weight=0.0, prior_residual_t=None,
                 cg_iters: int = _CG_ITERS):
    """One damped GN step via matrix-free Schur complement + CG.

    With ``axis_name`` set, observation arrays are device-local shards and
    every segment reduction is followed by a ``psum`` — the distributed BA
    path. Returns (delta_cams [N, 6], delta_lms [L, 3]).
    """
    cam_idx, lm_idx = problem.cam_idx, problem.lm_idx
    wj = w_obs[:, None, None]

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    # Block diagonals: U [N, 6, 6], V [L, 3, 3]
    jctjc = jnp.einsum("mri,mrj->mij", jc, wj * jc)
    jltjl = jnp.einsum("mri,mrj->mij", jl, wj * jl)
    U = allsum(_segment_sum(jctjc, cam_idx, n_cams))
    V = allsum(_segment_sum(jltjl, lm_idx, n_lms))
    eye6 = jnp.eye(6, dtype=res.dtype)
    eye3 = jnp.eye(3, dtype=res.dtype)
    U = U + damping * eye6[None]
    V = V + damping * eye3[None]
    # soft position prior on the translation block (gauge/scale anchor)
    prior_diag = jnp.concatenate(
        [jnp.zeros(3, res.dtype), jnp.full((3,), prior_weight, res.dtype)]
    )
    U = U + jnp.diag(prior_diag)[None]
    V_inv = jnp.linalg.inv(V)  # [L, 3, 3] batched tiny inversions

    # RHS: b_c = -Jc^T W r, b_l = -Jl^T W r
    wr = w_obs[:, None] * res
    b_c = allsum(_segment_sum(-jnp.einsum("mri,mr->mi", jc, wr), cam_idx,
                              n_cams))
    if prior_residual_t is not None:
        b_c = b_c - prior_weight * jnp.concatenate(
            [jnp.zeros_like(prior_residual_t), prior_residual_t], axis=-1
        )
    b_l = allsum(_segment_sum(-jnp.einsum("mri,mr->mi", jl, wr), lm_idx,
                              n_lms))

    # Schur RHS: b~ = b_c - W V^-1 b_l  (W = Jc^T W_obs Jl, obs-structured)
    def w_mul_landvec(y_l):
        """x_c = sum_obs Jc^T W Jl y_{lm(obs)} -> [N, 6]"""
        contrib = jnp.einsum(
            "mri,mrj,mj->mi", jc, wj * jl, y_l[lm_idx]
        )
        return allsum(_segment_sum(contrib, cam_idx, n_cams))

    def wt_mul_camvec(x_c):
        """y_l = sum_obs Jl^T W Jc x_{cam(obs)} -> [L, 3]"""
        contrib = jnp.einsum(
            "mri,mrj,mj->mi", jl, wj * jc, x_c[cam_idx]
        )
        return allsum(_segment_sum(contrib, lm_idx, n_lms))

    vinv_bl = jnp.einsum("lij,lj->li", V_inv, b_l)
    b_schur = b_c - w_mul_landvec(vinv_bl)

    def gauge(x):
        if fix_first:
            return x.at[0].set(0.0)
        return x

    b_schur = gauge(b_schur)

    def s_matvec(x_c):
        """S x = U x - W V^-1 W^T x (gauge-projected)."""
        x_c = gauge(x_c)
        ux = jnp.einsum("nij,nj->ni", U, x_c)
        wtx = wt_mul_camvec(x_c)
        vinv_wtx = jnp.einsum("lij,lj->li", V_inv, wtx)
        return gauge(ux - w_mul_landvec(vinv_wtx))

    # CG on the reduced camera system (S is SPD with damping)
    # Block-Jacobi preconditioner: M = U (the damped camera diagonal of S).
    # Standard for BA reduced camera systems — without it plain CG needs
    # O(n_cams) iterations on long-strip surveys (ill-conditioned S) and a
    # fixed iteration budget silently under-converges at scale.
    U_inv = jnp.linalg.inv(U)  # [N, 6, 6]

    def precond(r):
        return gauge(jnp.einsum("nij,nj->ni", U_inv, r))

    def cg_body(carry, _):
        x, r, p, rz = carry
        sp = s_matvec(p)
        denom = jnp.sum(p * sp)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        x = x + alpha * p
        r = r - alpha * sp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return (x, r, p, rz_new), None

    x0 = jnp.zeros_like(b_schur)
    z0 = precond(b_schur)
    (x_c, _, _, _), _ = jax.lax.scan(
        cg_body, (x0, b_schur, z0, jnp.sum(b_schur * z0)),
        None, length=cg_iters,
    )
    x_c = gauge(x_c)

    # Back-substitute landmarks: y = V^-1 (b_l - W^T x)
    y_l = jnp.einsum("lij,lj->li", V_inv, b_l - wt_mul_camvec(x_c))
    return x_c, y_l


def _bundle_adjust_impl(
    state: BAState,
    problem: BAProblem,
    cam: Camera,
    cfg: BundleAdjustmentConfig,
    n_cams: int,
    n_lms: int,
    axis_name=None,
) -> BAState:
    """LM loop shared by the single-device and sharded paths.

    With ``axis_name``, ``problem`` is this device's observation shard and
    all reductions psum over the axis (state stays replicated)."""
    trans_init = state.trans
    prior_weight = (
        1.0 / cfg.position_prior_sigma_m**2
        if cfg.position_prior_sigma_m > 0 else 0.0
    )

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def cost_of(st):
        res = reprojection_residuals(st, problem, cam)
        norm = jnp.linalg.norm(res, axis=-1)
        # capped Huber: constant beyond the outlier gate, so gated
        # observations exert no force on the accept decision either
        norm = jnp.minimum(norm, cfg.outlier_threshold_px)
        huber = jnp.where(
            norm <= cfg.huber_delta,
            0.5 * norm**2,
            cfg.huber_delta * (norm - 0.5 * cfg.huber_delta),
        )
        # prior is over replicated state: add it outside the psum
        prior = 0.5 * prior_weight * jnp.sum((st.trans - trans_init) ** 2)
        return allsum(jnp.sum(jnp.where(problem.valid, huber, 0.0))) + prior

    def lm_iter(carry, _):
        st, damping, cost = carry
        res, jc, jl = _obs_jacobians(st, problem, cam)
        w_obs = (
            _huber_weights(res, cfg.huber_delta, cfg.outlier_threshold_px)
            * problem.valid
        )
        dx_c, dx_l = _schur_solve(
            res, jc, jl, w_obs, problem, n_cams, n_lms, damping,
            cfg.fix_first_pose,
            axis_name=axis_name,
            prior_weight=prior_weight,
            prior_residual_t=st.trans - trans_init,
            cg_iters=cfg.cg_iterations,
        )
        q2, t2 = _apply_cam_delta(st.quats, st.trans, dx_c)
        cand = BAState(quats=q2, trans=t2, landmarks=st.landmarks + dx_l)
        new_cost = cost_of(cand)
        accept = new_cost < cost
        st = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, st
        )
        damping = jnp.where(accept, damping / cfg.damping_factor,
                            damping * cfg.damping_factor)
        damping = jnp.clip(damping, 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return (st, damping, cost), cost

    init_cost = cost_of(state)
    (final_state, _, _), _ = jax.lax.scan(
        lm_iter,
        (state, jnp.asarray(cfg.damping_init, jnp.float32), init_cost),
        None,
        length=cfg.max_iterations,
    )
    return final_state


@partial(jax.jit, static_argnames=("cam", "cfg", "n_cams", "n_lms"))
def bundle_adjust(
    state: BAState,
    problem: BAProblem,
    cam: Camera,
    cfg: BundleAdjustmentConfig = BundleAdjustmentConfig(),
    n_cams: int = None,
    n_lms: int = None,
) -> BAState:
    """Levenberg-Marquardt bundle adjustment; returns the refined state.

    Static iteration count (cfg.max_iterations); each iteration recomputes
    Jacobians, solves the damped Schur system, and accepts/rejects the step
    with the usual LM damping schedule — all under one jit.
    """
    n_cams = state.quats.shape[0] if n_cams is None else n_cams
    n_lms = state.landmarks.shape[0] if n_lms is None else n_lms
    return _bundle_adjust_impl(state, problem, cam, cfg, n_cams, n_lms)


@partial(jax.jit, static_argnames=("cam", "cfg", "mesh", "axis_name"))
def sharded_bundle_adjust(
    state: BAState,
    problem: BAProblem,
    cam: Camera,
    cfg: BundleAdjustmentConfig,
    mesh,
    axis_name: str = "obs",
) -> BAState:
    """Distributed BA: observations sharded across ``axis_name``, camera and
    landmark state replicated, every Schur/cost reduction a ``psum`` over
    ICI (SURVEY.md §2.3's distributed Schur-complement plan). Bitwise-equal
    to the single-device path up to floating-point reduction order.

    The observation count must be divisible by the axis size (pad with
    ``valid=False`` rows).
    """
    from jax.sharding import PartitionSpec as P

    n_cams = state.quats.shape[0]
    n_lms = state.landmarks.shape[0]
    n_dev = mesh.shape[axis_name]
    if problem.cam_idx.shape[0] % n_dev != 0:
        raise ValueError(
            f"observation count {problem.cam_idx.shape[0]} not divisible "
            f"by {n_dev} devices; pad with valid=False"
        )

    fn = jax.shard_map(
        partial(_bundle_adjust_impl, cam=cam, cfg=cfg, n_cams=n_cams,
                n_lms=n_lms, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            BAState(quats=P(), trans=P(), landmarks=P()),
            BAProblem(cam_idx=P(axis_name), lm_idx=P(axis_name),
                      uv=P(axis_name), valid=P(axis_name)),
        ),
        out_specs=BAState(quats=P(), trans=P(), landmarks=P()),
        check_vma=False,
    )
    return fn(state, problem)
