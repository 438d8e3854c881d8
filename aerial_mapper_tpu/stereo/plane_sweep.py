"""Plane-sweep multi-view densifier: elevation-plane hypotheses, N views.

A capability EXTENSION beyond the reference's 2-view virtual stereo
(``aerial_mapper_dense_pcl/src/stereo.cpp:149-193`` rectifies consecutive
pairs and runs cv::StereoBM/SGBM): for nadir aerial mapping the natural
hypothesis space is the WORLD ELEVATION of each ground point, so this
module sweeps horizontal planes z = z_k directly — no rectification, any
number of neighbor views, distortion-aware — and reads the winning plane
out as a per-pixel elevation:

  1. every reference pixel is back-projected and intersected with plane
     z_k -> a world point P_k(u, v) (closed form, batched);
  2. each neighbor view samples its image at the projection of P_k
     (``camera.models.project`` handles radtan/equidistant lenses — a
     homography shortcut would not) — one bilinear gather per (view,
     plane);
  3. the photoconsistency cost is the box-filtered mean absolute
     difference against the reference image over the views that see the
     point, normalized by the view count;
  4. a running winner-take-all over planes (the same carry pattern as the
     fused Pallas BM kernel: best, arg, cost[arg±1], runner-up) + the
     standard parabolic refinement between neighboring planes gives a
     sub-plane-spacing elevation estimate per pixel.

The sweep axis is a ``lax.scan`` carrying only [H, W] state, so the
[K, H, W] cost volume never materializes; memory is independent of the
plane count. The output is a point cloud in the same (points, valid)
layout ``process_pairs_batched`` produces, so it feeds the existing DSM
binned IDW and the backward-grid ortho unchanged.

Cost model (v5e): the gathers dominate — M views x K planes x H*W
indices. At the documented ~100-150 M idx/s gather rate, 2 views x
32 planes x 752x480 is ~0.2 s per reference view: an opt-in QUALITY
densifier (true multi-view fusion, sub-plane accuracy, no rectification
artifacts), not a replacement for the 10 ms/pair BM fast path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.camera.models import Camera, project
from aerial_mapper_tpu.config import PlaneSweepConfig
from aerial_mapper_tpu.image.sample import bilinear_sample
from aerial_mapper_tpu.stereo.matching import _box_filter

_BIG = 1.0e9


class PlaneSweepResult(NamedTuple):
    points: jax.Array  # [H*W, 3] world points at the winning elevation
    intensities: jax.Array  # [H*W] reference-image intensities
    valid: jax.Array  # [H*W] bool
    elevation: jax.Array  # [H, W] winning elevation (NaN where invalid)
    cost: jax.Array  # [H, W] winning aggregated cost


def _ray_dirs(cam: Camera, R_G_C: jax.Array) -> jax.Array:
    """[H, W, 3] world-frame ray directions through every pixel center."""
    h, w = cam.height, cam.width
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xn = (u - cam.cx) / cam.fx
    yn = (v - cam.cy) / cam.fy
    if cam.dist_kind != "none":
        from aerial_mapper_tpu.camera.models import undistort_points

        xy = undistort_points(cam, jnp.stack([xn, yn], axis=-1))
        xn, yn = xy[..., 0], xy[..., 1]
    d_cam = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
    return jnp.einsum("ij,hwj->hwi", R_G_C, d_cam,
                      precision=jax.lax.Precision.HIGHEST)


def auto_z_range(
    images,
    Rs: np.ndarray,
    ts: np.ndarray,
    cam: Camera,
    bm_cfg=None,
    use_every_nth: int = 1,
    num_prepass_pairs: int = 3,
    margin_m: float = 10.0,
    percentiles=(1.0, 99.0),
):
    """Derive a plane-sweep [z_min, z_max] from a cheap BM prepass.

    Runs the full-disparity-range pair matcher on up to
    ``num_prepass_pairs`` CONSECUTIVE-frame pairs spread evenly over the
    sequence (always consecutive, regardless of ``use_every_nth``: wider
    baselines push the true disparity past the search range and return
    only garbage matches — measured: a 9-frame stride at survey scale
    left 7 valid pixels triangulating 440 m off the terrain), takes
    robust percentiles of the triangulated world z (gross disparity
    outliers triangulate hundreds of meters off and must not stretch the
    sweep range — the measured bench-scale BM outlier tail,
    docs/PERFORMANCE.md densifier table), and widens by ``margin_m``.
    Pairs whose valid-match count is degenerate (< 1 % of pixels) are
    skipped. Cost: ~10 ms/pair on-device, amortized across the whole
    sweep (VERDICT r4 #4: the hand-set 374/454 defaults were centered on
    the synthetic scene; real data silently degraded).

    Returns (z_lo, z_hi) floats.
    """
    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.stereo.batched import (
        prepare_pair_operands,
        process_pairs_batched,
    )

    del use_every_nth  # prepass pairs are always consecutive (see above)
    if bm_cfg is None:
        bm_cfg = BlockMatchingConfig()
    n = len(images)
    if n < 2:
        raise ValueError("auto_z_range needs at least two frames")
    take = min(num_prepass_pairs, n - 1)
    starts = sorted({
        round(j * (n - 2) / max(take - 1, 1)) for j in range(take)
    })
    h, w = images[0].shape[-2], images[0].shape[-1]
    min_valid = max(256, (h * w) // 100)
    zs, weak = [], []
    for a in starts:
        ops = prepare_pair_operands(
            cam.K, np.asarray(Rs)[[a, a + 1]],
            np.asarray(ts)[[a, a + 1]],
            [images[a], images[a + 1]],
        )
        pts, _i, valid = process_pairs_batched(ops, cam, matcher="bm",
                                               bm_cfg=bm_cfg, batch_chunk=1)
        z = np.asarray(pts.reshape(-1, 3)[:, 2])
        v = np.asarray(valid.reshape(-1))
        (zs if v.sum() >= min_valid else weak).append(z[v])
    if not zs:
        # no pair cleared the degeneracy bar; fall back to whatever
        # matches exist rather than failing outright
        zs = [z for z in weak if z.size]
    if not zs:
        raise ValueError(
            "auto_z_range: the BM prepass produced no valid points — "
            "set --ps_z_min/--ps_z_max explicitly"
        )
    allz = np.concatenate(zs)
    lo, hi = np.percentile(allz, percentiles)
    return float(lo - margin_m), float(hi + margin_m)


def resolve_z_range(
    cfg: PlaneSweepConfig,
    images,
    Rs: np.ndarray,
    ts: np.ndarray,
    cam: Camera,
    bm_cfg=None,
    use_every_nth: int = 1,
) -> PlaneSweepConfig:
    """Fill any unset z bound of ``cfg`` from :func:`auto_z_range`;
    returns a config with concrete floats (a no-op when both are set)."""
    import dataclasses
    import logging

    if cfg.z_min is not None and cfg.z_max is not None:
        return cfg
    lo, hi = auto_z_range(images, Rs, ts, cam, bm_cfg=bm_cfg,
                          use_every_nth=use_every_nth)
    out = dataclasses.replace(
        cfg,
        z_min=cfg.z_min if cfg.z_min is not None else lo,
        z_max=cfg.z_max if cfg.z_max is not None else hi,
    )
    logging.getLogger("aerial_mapper_tpu").info(
        "plane sweep: auto z range [%.1f, %.1f] m from BM prepass "
        "(spacing %.2f m over %d planes)", out.z_min, out.z_max,
        (out.z_max - out.z_min) / max(out.num_planes - 1, 1),
        out.num_planes,
    )
    return out


def warn_boundary_pileup(points, valid, cfg: PlaneSweepConfig,
                         frac_threshold: float = 0.05,
                         max_samples: int = 200_000):
    """Warn when winning elevations pile up near the sweep-range ends —
    the signature of a range that clips the terrain (the boundary planes
    themselves are already rejected when ``reject_boundary_planes``, so
    the pile-up shows at the planes just inside). Returns the (low, high)
    pile-up fractions.

    The check runs on a ~``max_samples`` stride-decimated subset: the
    inputs are usually DEVICE arrays (the sweep's full cloud is ~150 MB
    at bench scale) and a fraction estimate does not need every point —
    decimating BEFORE the host transfer keeps this a <2 MB readback."""
    import logging

    pts = points.reshape(-1, 3)
    vv = valid.reshape(-1)
    stride = max(1, int(pts.shape[0]) // max_samples)
    z = np.asarray(pts[::stride, 2])
    v = np.asarray(vv[::stride])
    if not v.any() or cfg.z_min is None or cfg.z_max is None:
        return 0.0, 0.0
    z = z[v]
    spacing = (cfg.z_max - cfg.z_min) / max(cfg.num_planes - 1, 1)
    frac_lo = float((z < cfg.z_min + 1.5 * spacing).mean())
    frac_hi = float((z > cfg.z_max - 1.5 * spacing).mean())
    if frac_lo > frac_threshold or frac_hi > frac_threshold:
        logging.getLogger("aerial_mapper_tpu").warning(
            "plane sweep: %.1f%% / %.1f%% of winning elevations sit "
            "within 1.5 plane spacings of the z range ends [%.1f, %.1f] "
            "— the range likely clips the terrain; widen --ps_z_min/"
            "--ps_z_max (or leave them unset for the auto range)",
            100 * frac_lo, 100 * frac_hi, cfg.z_min, cfg.z_max,
        )
    return frac_lo, frac_hi


@partial(jax.jit, static_argnames=("cam", "cfg"))
def plane_sweep_elevation(
    ref_image: jax.Array,  # [H, W] grayscale
    R_ref: jax.Array,  # [3, 3] camera-to-world
    t_ref: jax.Array,  # [3]
    nbr_images: jax.Array,  # [M, H, W]
    R_cw_nbrs: jax.Array,  # [M, 3, 3] world-to-camera
    t_nbrs: jax.Array,  # [M, 3] camera positions
    cam: Camera,
    cfg: PlaneSweepConfig = PlaneSweepConfig(),
) -> PlaneSweepResult:
    """Sweep ``cfg.num_planes`` elevation planes in [z_min, z_max]."""
    if cfg.z_min is None or cfg.z_max is None:
        raise ValueError(
            "plane sweep z range unresolved: pass the config through "
            "resolve_z_range(...) (the drivers do) or set z_min/z_max"
        )
    h, w = ref_image.shape
    ref_f = ref_image.astype(jnp.float32)
    dirs = _ray_dirs(cam, R_ref)  # [H, W, 3]
    dz = dirs[..., 2]
    dz = jnp.where(jnp.abs(dz) < 1e-9, -1e-9, dz)
    zs = jnp.linspace(cfg.z_min, cfg.z_max,
                      cfg.num_planes).astype(jnp.float32)
    dzp = zs[1] - zs[0] if cfg.num_planes > 1 else jnp.float32(1.0)

    def cost_at(z0):
        """([H, W] cost, [H, W] valid-view count) at plane z = z0."""
        s = (z0 - t_ref[2]) / dz
        pts = t_ref[None, None] + s[..., None] * dirs  # [H, W, 3]
        total = jnp.zeros((h, w), jnp.float32)
        count = jnp.zeros((h, w), jnp.float32)
        for j in range(nbr_images.shape[0]):
            p_c = jnp.einsum(
                "ij,hwj->hwi", R_cw_nbrs[j],
                pts - t_nbrs[j][None, None],
                precision=jax.lax.Precision.HIGHEST,
            )
            uv, vis = project(cam, p_c)
            # sample in the image's OWN dtype: uint8 sources gather
            # 1-byte texels (~10-35% faster per index, CLAUDE.md);
            # bilinear_sample's lerp upcasts after the fetch
            samp = bilinear_sample(nbr_images[j], uv[..., 0], uv[..., 1])
            ad = jnp.abs(ref_f - samp)
            ok = vis & (s > 0)
            total = total + jnp.where(ok, ad, 0.0)
            count = count + ok.astype(jnp.float32)
        # box-aggregate the SAD and the view counts together so the
        # normalization stays exact at view-visibility borders
        agg = _box_filter(total, cfg.block_size)
        cnt = _box_filter(count, cfg.block_size)
        cost = jnp.where(cnt > 0, agg / jnp.maximum(cnt, 1.0), _BIG)
        return cost, count

    # running WTA over the sweep (carry = [H, W] state only; the same
    # best/arg/cm/cp/runner pattern as the fused BM kernel)
    def body(carry, k):
        best, bestk, cm, cp, prev, runner, bcnt = carry
        cost, count = cost_at(zs[k])
        is_better = cost < best
        runner = jnp.where(
            is_better,
            jnp.minimum(runner, jnp.where(jnp.abs(bestk - k) > 1, best,
                                          _BIG)),
            jnp.minimum(runner, jnp.where(jnp.abs(k - bestk) > 1, cost,
                                          _BIG)),
        )
        cp = jnp.where(k == bestk + 1, cost, cp)
        cm = jnp.where(is_better, prev, cm)
        bcnt = jnp.where(is_better, count, bcnt)
        bestk = jnp.where(is_better, k, bestk)
        best = jnp.minimum(best, cost)
        return (best, bestk, cm, cp, cost, runner, bcnt), None

    init = (
        jnp.full((h, w), _BIG),
        jnp.full((h, w), -2, jnp.int32),
        jnp.full((h, w), _BIG),
        jnp.full((h, w), _BIG),
        jnp.full((h, w), _BIG),
        jnp.full((h, w), _BIG),
        jnp.zeros((h, w), jnp.float32),
    )
    (best, bestk, cm, cp, _, runner, bcnt), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.num_planes, dtype=jnp.int32),
        unroll=cfg.scan_unroll,
    )

    # parabolic sub-plane refinement (identical gating to the matchers)
    denom = cm - 2.0 * best + cp
    delta = jnp.where(jnp.abs(denom) > 1e-9, (cm - cp) / (2.0 * denom),
                      0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (bestk > 0) & (bestk < cfg.num_planes - 1)
    z_star = zs[jnp.clip(bestk, 0, cfg.num_planes - 1)] + \
        jnp.where(interior, delta, 0.0) * dzp

    valid = best < _BIG
    valid &= bcnt >= cfg.min_views
    valid &= best <= cfg.max_cost
    if cfg.reject_boundary_planes:
        valid &= interior  # range-clipping artifacts, unrefinable
    if cfg.uniqueness_ratio > 0:
        valid &= runner >= best * (1.0 + cfg.uniqueness_ratio / 100.0)

    s = (z_star - t_ref[2]) / dz
    pts = t_ref[None, None] + s[..., None] * dirs
    valid &= s > 0
    elevation = jnp.where(valid, z_star, jnp.nan)
    return PlaneSweepResult(
        points=pts.reshape(-1, 3),
        intensities=ref_f.reshape(-1),
        valid=valid.reshape(-1),
        elevation=elevation,
        cost=jnp.where(valid, best, jnp.nan),
    )


def _neighbor_sets(n: int, idx, num_neighbors: int, spacing: int = 1):
    """Neighbor views per reference frame: nearest multiples of
    ``spacing`` frames away (ri - s, ri + s, ri - 2s, ...), clipped to the
    sequence. spacing=1 is the plain nearest-in-sequence choice."""
    out = []
    for ri in idx:
        cands = []
        k = 1
        while len(cands) < num_neighbors and k * spacing < n + spacing:
            for j in (ri - k * spacing, ri + k * spacing):
                if 0 <= j < n and j != ri and j not in cands:
                    cands.append(j)
            k += 1
        out.append(cands[:num_neighbors])
    return out


def process_sequence_plane_sweep(
    images,
    Rs: np.ndarray,  # [N, 3, 3] camera-to-world
    ts: np.ndarray,  # [N, 3]
    cam: Camera,
    cfg: PlaneSweepConfig = PlaneSweepConfig(),
    use_every_nth: int = 1,
):
    """Every n-th frame becomes a reference view matched against its
    ``cfg.num_neighbors`` nearest (in sequence) other frames — the
    multi-view analogue of the reference's consecutive-pair loop
    (stereo.cpp:91-110). Returns (points [P, 3], intensities [P],
    valid [P]) stacked over reference views."""
    n = len(images)
    if n < 2:
        raise ValueError("plane sweep needs at least two frames")
    cfg = resolve_z_range(cfg, images, Rs, ts, cam,
                          use_every_nth=use_every_nth)
    # reference-phase stride (frames n-1, 2n-1, ... — stereo.cpp:91-93)
    idx = list(range(use_every_nth - 1, n, use_every_nth))
    R_cw = np.transpose(np.asarray(Rs, np.float64), (0, 2, 1))
    all_pts, all_int, all_valid = [], [], []
    for ri, nbrs in zip(idx, _neighbor_sets(n, idx, cfg.num_neighbors,
                                         cfg.neighbor_spacing)):
        if not nbrs:
            continue
        # images keep their input dtype (uint8 gathers 1-byte texels;
        # the sweep upcasts after sampling) — same policy as the batched
        # path's PlaneSweepOperands
        res = plane_sweep_elevation(
            jnp.asarray(images[ri]),
            jnp.asarray(Rs[ri], jnp.float32),
            jnp.asarray(ts[ri], jnp.float32),
            jnp.stack([jnp.asarray(images[j]) for j in nbrs]),
            jnp.asarray(R_cw[nbrs], jnp.float32),
            jnp.asarray(np.asarray(ts)[nbrs], jnp.float32),
            cam, cfg,
        )
        all_pts.append(res.points)
        all_int.append(res.intensities)
        all_valid.append(res.valid)
    return (
        jnp.concatenate(all_pts),
        jnp.concatenate(all_int),
        jnp.concatenate(all_valid),
    )


class PlaneSweepOperands(NamedTuple):
    """Batched reference-view operands: ONE unique image stack plus
    [B]-indexed view assignments — frames are never duplicated into
    per-slot copies (a [B, M+1, H, W] layout would ship every frame
    ~(1+M)x over the host link; the stack + index form ships it once,
    like the pair path's ring layout). The poses ride pre-gathered
    (tiny), only the images stay indexed. ``view_idx[b] = [ref, nbr_0 ..
    nbr_{M-1}]``; slot images resolve inside the jit with a device-side
    take. Images keep their input dtype (uint8 stays uint8 for the
    cheaper gathers; the sweep upcasts after sampling)."""

    images: jax.Array  # [N, H, W] unique frames
    view_idx: jax.Array  # [B, 1 + M] int32: reference + neighbors
    R_refs: jax.Array  # [B, 3, 3]
    t_refs: jax.Array  # [B, 3]
    R_cw_nbrs: jax.Array  # [B, M, 3, 3]
    t_nbrs: jax.Array  # [B, M, 3]
    ref_valid: jax.Array  # [B] bool (False = padding slot)


def prepare_plane_sweep_operands(
    images,
    Rs: np.ndarray,
    ts: np.ndarray,
    cfg: PlaneSweepConfig = PlaneSweepConfig(),
    use_every_nth: int = 1,
    pad_to_multiple: int = 1,
) -> PlaneSweepOperands:
    """Host-side: sequence -> batched reference-view operands (padded to
    a multiple of the device count for sharding; padding slots repeat the
    last view and carry ref_valid=False)."""
    n = len(images)
    # reference-phase stride (frames n-1, 2n-1, ... — stereo.cpp:91-93)
    idx = list(range(use_every_nth - 1, n, use_every_nth))
    nbr_sets = _neighbor_sets(n, idx, cfg.num_neighbors,
                              cfg.neighbor_spacing)
    idx = [ri for ri, nb in zip(idx, nbr_sets) if nb]
    nbr_sets = [nb for nb in nbr_sets if nb]
    if not idx:
        raise ValueError("plane sweep needs at least two frames")
    m = min(len(s) for s in nbr_sets)
    nbr_sets = [s[:m] for s in nbr_sets]
    R_cw = np.transpose(np.asarray(Rs, np.float64), (0, 2, 1))
    b = len(idx)
    pad = (-b) % pad_to_multiple
    slots = idx + [idx[-1]] * pad
    nbrs_all = nbr_sets + [nbr_sets[-1]] * pad
    view_idx = np.asarray(
        [[ri] + list(nb) for ri, nb in zip(slots, nbrs_all)], np.int32)
    return PlaneSweepOperands(
        images=jnp.stack([jnp.asarray(im) for im in images]),
        view_idx=jnp.asarray(view_idx),
        R_refs=jnp.asarray(np.asarray(Rs)[slots], jnp.float32),
        t_refs=jnp.asarray(np.asarray(ts)[slots], jnp.float32),
        R_cw_nbrs=jnp.asarray(
            np.stack([R_cw[nb] for nb in nbrs_all]), jnp.float32),
        t_nbrs=jnp.asarray(
            np.stack([np.asarray(ts)[nb] for nb in nbrs_all]), jnp.float32),
        ref_valid=jnp.concatenate(
            [jnp.ones((b,), bool), jnp.zeros((pad,), bool)]),
    )


@partial(jax.jit, static_argnames=("cam", "cfg"))
def plane_sweep_batched(ops: PlaneSweepOperands, cam: Camera,
                        cfg: PlaneSweepConfig = PlaneSweepConfig()):
    """vmapped sweep over the reference-view batch; returns
    (points [B, H*W, 3], intensities [B, H*W], valid [B, H*W]). Slot
    images come from a device-side take of the unique stack."""
    def one(vidx, Rr, tr, Rcw, tn, ok):
        # frames keep their input dtype: uint8 stays uint8 through the
        # neighbor gathers (the sweep upcasts after sampling)
        frames = jnp.take(ops.images, vidx, axis=0)
        res = plane_sweep_elevation(frames[0], Rr, tr, frames[1:],
                                    Rcw, tn, cam, cfg)
        return res.points, res.intensities, res.valid & ok

    return jax.vmap(one)(
        ops.view_idx, ops.R_refs, ops.t_refs,
        ops.R_cw_nbrs, ops.t_nbrs, ops.ref_valid,
    )
