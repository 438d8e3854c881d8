"""Stereo pipeline tests: rectification geometry, matching quality,
triangulation parity, end-to-end cloud accuracy on a synthetic scene."""

import numpy as np
import jax.numpy as jnp

from aerial_mapper_tpu.camera import Camera
from aerial_mapper_tpu.config import BlockMatchingConfig, SgmConfig, StereoConfig
from aerial_mapper_tpu.stereo import (
    VirtualStereo,
    block_matching_disparity,
    rectification_transforms,
    rectify_pair,
    sgm_disparity,
)
from aerial_mapper_tpu.stereo.triangulate import triangulate_disparity
from aerial_mapper_tpu.synth import SyntheticScene, make_survey_poses, render_image
from aerial_mapper_tpu.testing.numpy_ref import (
    rectification_reference,
    triangulate_reference,
)

CAM = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)
SCENE = SyntheticScene(base_elevation=414.0, relief_amplitude=5.0)


def nadir_pair(baseline=6.0, altitude=514.0):
    R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    t1 = np.array([0.0, 0.0, altitude])
    t2 = np.array([baseline, 0.0, altitude])
    return R, t1, t2


def test_rectification_matches_reference_algebra():
    rng = np.random.default_rng(3)
    R1 = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    R1 *= np.sign(np.linalg.det(R1))
    R2 = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    R2 *= np.sign(np.linalg.det(R2))
    t1 = rng.normal(size=3)
    t2 = t1 + rng.normal(size=3)
    K = CAM.K
    ours = rectification_transforms(K, R1, R2, t1, t2)
    R_ref, T1_ref, T2_ref, b_ref = rectification_reference(K, R1, R2, t1, t2)
    np.testing.assert_allclose(ours.R_G_C_rect, R_ref, atol=1e-12)
    np.testing.assert_allclose(ours.T1, T1_ref, atol=1e-9)
    np.testing.assert_allclose(ours.T2, T2_ref, atol=1e-9)
    assert abs(ours.baseline - b_ref) < 1e-12


def test_rectified_pair_has_epipolar_alignment():
    """After rectification, a world point must project to the same row in
    both rectified images (the Fusiello property)."""
    R, t1, t2 = nadir_pair()
    tf = rectification_transforms(CAM.K, R, R, t1, t2)
    rng = np.random.default_rng(7)
    pts = np.stack(
        [
            rng.uniform(10, 80, 50),
            rng.uniform(-30, 30, 50),
            rng.uniform(410, 420, 50),
        ],
        axis=1,
    )
    P1 = CAM.K @ np.hstack([tf.R_G_C_rect, (tf.R_G_C_rect @ (-t1))[:, None]])
    P2 = CAM.K @ np.hstack([tf.R_G_C_rect, (tf.R_G_C_rect @ (-t2))[:, None]])
    ph = np.hstack([pts, np.ones((50, 1))])
    p1 = (P1 @ ph.T).T
    p2 = (P2 @ ph.T).T
    v1 = p1[:, 1] / p1[:, 2]
    v2 = p2[:, 1] / p2[:, 2]
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    # left image should be to the right in pixel coords (positive disparity)
    u1 = p1[:, 0] / p1[:, 2]
    u2 = p2[:, 0] / p2[:, 2]
    assert np.all(u1 - u2 > 0)


def render_rect_pair(baseline=6.0):
    R, t1, t2 = nadir_pair(baseline)
    img1 = render_image(SCENE, CAM, jnp.asarray(R, jnp.float32),
                        jnp.asarray(t1, jnp.float32))
    img2 = render_image(SCENE, CAM, jnp.asarray(R, jnp.float32),
                        jnp.asarray(t2, jnp.float32))
    rect = rectify_pair(CAM.K, R, R, t1, t2, img1, img2)
    return rect, R, t1, t2


def expected_disparity(rect, t1, altitude=514.0):
    # flat-ish scene at elevation ~414 -> depth ~100 below camera;
    # disparity ~= fx * baseline / depth
    return float(CAM.fx) * float(rect.baseline) / (altitude - 414.0)


def _disparity_quality(disp, rect, t1):
    d_exp = expected_disparity(rect, t1)
    d = np.asarray(disp)
    valid = d > 1.0
    interior = np.zeros_like(valid)
    interior[40:-40, 60:-40] = True
    sel = valid & interior & np.asarray(rect.mask)
    assert sel.mean() > 0.2, f"too few valid disparities: {sel.mean()}"
    err = np.abs(d[sel] - d_exp)
    # terrain relief (+-5 m at 100 m depth, 6 m baseline) moves true disparity
    # by ~1 px; accept median within 1.5 px of the flat-ground estimate
    assert np.median(err) < 1.5, f"median disparity err {np.median(err)}"


def test_block_matching_on_synthetic_pair():
    rect, R, t1, t2 = render_rect_pair()
    disp = block_matching_disparity(
        rect.image_left, rect.image_right, rect.mask,
        BlockMatchingConfig(num_disparities=48),
    )
    _disparity_quality(disp, rect, t1)


def test_block_matching_float_costs_path():
    """integer_costs=False (the float cost volume) must match the default
    int16 path closely: same quality bar and near-identical disparities
    (they differ only through the cv-style input quantization)."""
    rect, R, t1, t2 = render_rect_pair()
    d_int = np.asarray(block_matching_disparity(
        rect.image_left, rect.image_right, rect.mask,
        BlockMatchingConfig(num_disparities=48),
    ))
    d_flt = np.asarray(block_matching_disparity(
        rect.image_left, rect.image_right, rect.mask,
        BlockMatchingConfig(num_disparities=48, integer_costs=False),
    ))
    _disparity_quality(jnp.asarray(d_flt), rect, t1)
    both = (d_int > 1.0) & (d_flt > 1.0)
    assert both.mean() > 0.2
    err = np.abs(d_int[both] - d_flt[both])
    assert np.median(err) < 0.1, f"median int-vs-float {np.median(err)}"
    assert (err <= 1.0).mean() > 0.95


def test_block_matching_int16_overflow_guard_falls_back():
    """A config whose window sums could overflow int16
    (2*cap*block^2 >= 32767) must silently use the float path and still
    produce sane disparities."""
    import dataclasses

    rect, R, t1, t2 = render_rect_pair()
    cfg = BlockMatchingConfig(num_disparities=48, block_size=21,
                              pre_filter_cap=63)
    assert 2 * cfg.pre_filter_cap * cfg.block_size ** 2 >= 32767
    d = np.asarray(block_matching_disparity(
        rect.image_left, rect.image_right, rect.mask, cfg))
    d_float = np.asarray(block_matching_disparity(
        rect.image_left, rect.image_right, rect.mask,
        dataclasses.replace(cfg, integer_costs=False)))
    # guard forces the same float path modulo the input rounding — but the
    # int16 request must not overflow/garble; winners should mostly agree
    both = (d > 1.0) & (d_float > 1.0)
    assert both.mean() > 0.2
    assert np.median(np.abs(d[both] - d_float[both])) < 0.1


def test_sgm_on_synthetic_pair():
    rect, R, t1, t2 = render_rect_pair()
    disp = sgm_disparity(
        rect.image_left, rect.image_right, rect.mask,
        SgmConfig(num_disparities=48),
    )
    _disparity_quality(disp, rect, t1)


def test_triangulation_parity_with_reference_loop():
    rng = np.random.default_rng(11)
    h, w = 12, 16
    disparity = rng.uniform(0.0, 20.0, size=(h, w))
    image = rng.uniform(0, 255, size=(h, w))
    R_rect = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    R_rect *= np.sign(np.linalg.det(R_rect))
    t1 = np.array([3.0, -2.0, 90.0])
    baseline = 5.0
    K = CAM.K

    pts, intens, valid = triangulate_disparity(
        jnp.asarray(disparity, jnp.float32),
        jnp.asarray(image, jnp.float32),
        jnp.asarray(R_rect, jnp.float32),
        jnp.asarray(t1, jnp.float32),
        jnp.asarray(baseline, jnp.float32),
        fx=CAM.fx, fy=CAM.fy, cx=CAM.cx, cy=CAM.cy,
    )
    # Reference loop triangulates with R_G_C * p (densifier.cpp:72); we use
    # the corrected R^T (see triangulate.py) — feed the transpose to compare.
    ref_pts, ref_int = triangulate_reference(
        disparity, image, K, baseline, R_rect.T, t1
    )
    ours = np.asarray(pts)[np.asarray(valid)]
    np.testing.assert_allclose(ours, ref_pts, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(intens)[np.asarray(valid)], ref_int, atol=1e-3
    )


def test_end_to_end_cloud_accuracy():
    """Virtual stereo over 4 synthetic frames: triangulated points must lie
    on the analytic terrain within ~1 m vertically (median)."""
    Rs, ts = make_survey_poses(4, altitude=514.0, spacing=6.0)
    images = [
        render_image(SCENE, CAM, jnp.asarray(R, jnp.float32),
                     jnp.asarray(t, jnp.float32))
        for R, t in zip(Rs, ts)
    ]
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat

    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs)))
    engine = VirtualStereo(
        CAM,
        StereoConfig(matcher="bm"),
        bm_cfg=BlockMatchingConfig(num_disparities=48),
    )
    results = engine.process_sequence(images, quats, ts)
    assert len(results) == 3
    pts = np.concatenate([np.asarray(r.points)[np.asarray(r.valid)]
                          for r in results])
    assert pts.shape[0] > 10000
    z_true = np.asarray(
        SCENE.height(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]))
    )
    err = np.abs(pts[:, 2] - z_true)
    assert np.median(err) < 1.0, f"median vertical error {np.median(err)} m"


def _lr_reference_loop(cost, min_disp):
    """Brute-force oracle for ``_lr_consistency_mask``.

    Right-view cost is the diagonal of the left volume,
    cost_R[d, v, u_r] = cost_L[d, v, u_r + min_disp + d]; a left pixel with
    winner dL passes when some d'' in {dL-1, dL, dL+1} attains the minimum
    of the right column u_r = u - min_disp - dL (index-level check like
    cv::validateDisparity with disp12MaxDiff=1; ties accept any minimizer).
    The d'' = dL-/+1 marks are read from left pixels u-/+1, so they carry
    the implementation's array-bound guards on u.
    """
    big = 1.0e9
    D, H, W = cost.shape
    best = cost.argmin(axis=0)
    out = np.zeros((H, W), bool)
    for v in range(H):
        for u in range(W):
            dL = int(best[v, u])
            ur = u - min_disp - dL
            if ur < 0:
                continue
            col = np.full(D, big)
            for d in range(D):
                x = ur + min_disp + d
                if x < W:
                    col[d] = cost[d, v, x]
            m = col.min()
            for dd, uu in ((dL, u), (dL - 1, u - 1), (dL + 1, u + 1)):
                if 0 <= dd < D and 0 <= uu < W and col[dd] == m:
                    out[v, u] = True
                    break
    return out


def test_lr_consistency_matches_bruteforce_oracle():
    from aerial_mapper_tpu.stereo.matching import _lr_consistency_mask

    rng = np.random.default_rng(3)
    for min_disp in (0, 3):
        cost = rng.uniform(0.0, 100.0, size=(8, 6, 32)).astype(np.float32)
        best = jnp.asarray(cost.argmin(axis=0).astype(np.int32))
        ours = np.asarray(
            _lr_consistency_mask(jnp.asarray(cost), best, min_disp)
        )
        ref = _lr_reference_loop(cost, min_disp)
        np.testing.assert_array_equal(ours, ref, err_msg=f"{min_disp=}")


def test_sgm_aggregate_matches_loop_oracle():
    """The sheared restart-flag aggregation must equal the per-path loop
    oracle (fresh DP restart at every border) for 4 AND 8 directions —
    the 8-dir case exercises the modular shear's wrap restart."""
    from aerial_mapper_tpu.stereo.matching import sgm_aggregate
    from aerial_mapper_tpu.testing.numpy_ref import sgm_aggregate_reference

    rng = np.random.default_rng(5)
    cost = rng.uniform(0.0, 50.0, size=(12, 9, 5))  # H > W: many wraps
    for ndirs in (4, 8):
        cfg = SgmConfig(num_directions=ndirs, p1=7.0, p2=30.0)
        ours = np.asarray(
            sgm_aggregate(jnp.asarray(cost, jnp.float32), cfg)
        )
        ref = sgm_aggregate_reference(cost, 7.0, 30.0, ndirs)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-3)


def test_sgm_against_cv2_stereosgbm_oracle():
    """cv2.StereoSGBM oracle on the rendered synthetic pair (the reference
    wraps exactly this matcher, block-matching-sgbm.cpp:13-37): where both
    accept a pixel the disparities must agree closely."""
    import pytest

    cv2 = pytest.importorskip("cv2")

    rect, R, t1, t2 = render_rect_pair()
    num_disp = 48  # multiple of 16 as cv2 requires
    cfg = SgmConfig(num_disparities=num_disp, min_disparity=1)
    ours = np.asarray(
        sgm_disparity(rect.image_left, rect.image_right, rect.mask, cfg)
    )
    matcher = cv2.StereoSGBM_create(
        minDisparity=cfg.min_disparity, numDisparities=num_disp,
        blockSize=cfg.block_size, P1=int(cfg.p1), P2=int(cfg.p2),
        uniquenessRatio=cfg.uniqueness_ratio, disp12MaxDiff=0,
        speckleWindowSize=cfg.speckle_window_size,
        speckleRange=int(cfg.speckle_range), preFilterCap=35,
        mode=cv2.STEREO_SGBM_MODE_HH,  # full 8-direction aggregation
    )
    l8 = np.asarray(rect.image_left).astype(np.uint8)
    r8 = np.asarray(rect.image_right).astype(np.uint8)
    d_cv = matcher.compute(l8, r8).astype(np.float32) / 16.0
    mask = np.asarray(rect.mask)
    both = (ours > 1.0) & (d_cv > 1.0) & mask
    assert both.mean() > 0.2, f"joint valid fraction {both.mean():.3f}"
    err = np.abs(ours[both] - d_cv[both])
    assert np.median(err) < 0.5, f"median |ours - cv2| = {np.median(err)}"
    assert (err < 1.0).mean() > 0.9, f"within-1px rate {(err < 1.0).mean()}"


def test_speckle_cc_matches_cv2_filterspeckles():
    """Connected-component speckle mode vs cv2.filterSpeckles: identical
    surviving-pixel sets (same 4-connectivity |dd| <= range edge rule and
    count <= maxSpeckleSize kill rule)."""
    import pytest

    cv2 = pytest.importorskip("cv2")
    from aerial_mapper_tpu.stereo.matching import _speckle_mask_cc

    rng = np.random.default_rng(9)
    h, w = 60, 80
    # piecewise-constant patches + salt noise -> many region sizes,
    # including snakes; integer-valued so the cv int16 comparison is exact
    base = rng.integers(2, 30, size=(h // 10, w // 10)).repeat(10, 0).repeat(10, 1)
    noise = rng.integers(0, 60, size=(h, w)) * (rng.random((h, w)) < 0.07)
    disp = (base + noise).astype(np.float32)
    valid = rng.random((h, w)) > 0.1

    for max_size, rng_d in ((24, 3), (100, 1)):
        ours = np.asarray(
            _speckle_mask_cc(
                jnp.asarray(disp), jnp.asarray(valid), max_size, float(rng_d)
            )
        )
        new_val = -1600
        img = np.where(valid, (disp * 16).astype(np.int16),
                       np.int16(new_val))
        cv2.filterSpeckles(img, new_val, max_size, rng_d * 16)
        cv_keep = img != new_val
        np.testing.assert_array_equal(
            ours, cv_keep & valid, err_msg=f"{max_size=} {rng_d=}"
        )


def test_speckle_cc_serpentine_worst_case():
    """A width-1 serpentine corridor maximizes geodesic diameter per pixel
    — the hardest case for the log-iteration labeler. A long snake must
    survive as ONE region; a short one must die entirely."""
    from aerial_mapper_tpu.stereo.matching import _speckle_mask_cc

    h, w = 40, 50

    def snake_mask(rows):
        m = np.zeros((h, w), bool)
        for k, r in enumerate(range(0, rows, 2)):
            m[r, :] = True  # full row
            if r + 1 < h:
                m[r + 1, w - 1 if k % 2 == 0 else 0] = True  # connector
        return m

    long_m = snake_mask(30)  # ~750 px, diameter ~ area
    disp = jnp.full((h, w), 10.0)
    keep = np.asarray(
        _speckle_mask_cc(disp, jnp.asarray(long_m), 100, 1.0)
    )
    np.testing.assert_array_equal(keep, long_m)  # survives intact

    short_m = np.zeros((h, w), bool)
    short_m[0, :30] = True  # 30 px < 100
    keep = np.asarray(
        _speckle_mask_cc(disp, jnp.asarray(short_m), 100, 1.0)
    )
    assert not keep.any()


def test_speckle_cc_serpentine_production_scale():
    """ADVICE r2: the ceil(log2(H*W))+4 iteration bound is validated
    empirically at PRODUCTION scale (752x480) on the width-1 serpentine
    worst case, with ``max_size = region_size - 1`` so survival requires
    the EXACT region count — any non-converged labeling (>= 2 roots)
    undercounts some root's region and kills pixels, failing the test."""
    from aerial_mapper_tpu.stereo.matching import _speckle_mask_cc

    h, w = 480, 752
    m = np.zeros((h, w), bool)
    for k, r in enumerate(range(0, h, 2)):
        m[r, :] = True
        if r + 1 < h:
            m[r + 1, w - 1 if k % 2 == 0 else 0] = True
    size = int(m.sum())  # ~181k px, geodesic diameter ~ area
    disp = jnp.full((h, w), 10.0)
    keep = np.asarray(
        _speckle_mask_cc(disp, jnp.asarray(m), size - 1, 1.0)
    )
    np.testing.assert_array_equal(keep, m)


def test_block_matching_cc_speckle_mode():
    """End-to-end BM with the cv-parity CC speckle filter: quality holds
    and the surviving set differs only in small islands vs windowed."""
    import dataclasses

    rect, R, t1, t2 = render_rect_pair()
    cfg = BlockMatchingConfig(num_disparities=48, speckle_mode="cc")
    disp = block_matching_disparity(
        rect.image_left, rect.image_right, rect.mask, cfg)
    _disparity_quality(disp, rect, t1)
    d_win = np.asarray(block_matching_disparity(
        rect.image_left, rect.image_right, rect.mask,
        dataclasses.replace(cfg, speckle_mode="windowed")))
    d_cc = np.asarray(disp)
    both = (d_cc > 1.0) & (d_win > 1.0)
    # identical disparities where both accept (the filters only mask)
    np.testing.assert_array_equal(d_cc[both], d_win[both])


def test_disparity_range_from_slab():
    """VERDICT r4 #7: the slab-derived disparity window brackets every
    true disparity of terrain inside the slab, shrinks the search well
    below the 80-disparity default, and the bounded matcher reproduces
    the full-range matcher's cloud wherever both accept."""
    from aerial_mapper_tpu.stereo.batched import (
        disparity_range_from_slab,
        prepare_pair_operands,
        process_pairs_batched,
    )

    Rs, ts = make_survey_poses(4, altitude=514.0, spacing=6.0)
    images = [
        render_image(SCENE, CAM, jnp.asarray(R, jnp.float32),
                     jnp.asarray(t, jnp.float32))
        for R, t in zip(Rs, ts)
    ]
    z_lo, z_hi = 414.0 - 5.0, 414.0 + 5.0  # the scene's relief envelope
    lo, num = disparity_range_from_slab(
        CAM.K, Rs, ts, (CAM.height, CAM.width), z_lo, z_hi)
    # analytic check: nadir disparity d = fx*b/(alt - z); corners push it
    # higher by the off-axis ray obliquity
    d_nadir_lo = 320.0 * 6.0 / (514.0 - z_lo)
    d_nadir_hi = 320.0 * 6.0 / (514.0 - z_hi)
    assert lo <= d_nadir_lo - 1 and lo + num >= d_nadir_hi + 1, \
        (lo, num, d_nadir_lo, d_nadir_hi)
    assert num < 80, num  # the point: a real reduction vs the default
    assert lo % 8 == 0 and num % 16 == 0  # compile-shape quantization

    ops = prepare_pair_operands(CAM.K, Rs, ts, images)
    full_cfg = BlockMatchingConfig(num_disparities=80)
    slab_cfg = BlockMatchingConfig(min_disparity=lo, num_disparities=num)
    pts_f, _i, val_f = process_pairs_batched(ops, CAM, bm_cfg=full_cfg)
    pts_s, _i, val_s = process_pairs_batched(ops, CAM, bm_cfg=slab_cfg)
    vf = np.asarray(val_f).reshape(-1)
    vs = np.asarray(val_s).reshape(-1)
    zf = np.asarray(pts_f.reshape(-1, 3)[:, 2])
    zs = np.asarray(pts_s.reshape(-1, 3)[:, 2])
    # full-range winners inside the slab are found identically by the
    # bounded search (same WTA winner; acceptance sets may differ at the
    # margins through uniqueness/texture context — require near-total
    # agreement, not bit equality)
    in_slab = vf & (zf >= z_lo) & (zf <= z_hi)
    both = in_slab & vs
    assert both.sum() > 0.97 * in_slab.sum()
    np.testing.assert_allclose(zs[both], zf[both], atol=1e-3)
    # coverage parity overall (the slab contains the terrain)
    assert vs.sum() > 0.95 * vf.sum()
    # degenerate slabs are rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="camera altitude"):
        disparity_range_from_slab(
            CAM.K, Rs, ts, (CAM.height, CAM.width), 400.0, 600.0)


def test_disparity_from_slab_through_pipeline():
    """StereoConfig.disparity_from_slab drives run_dsm end-to-end: the
    derived window is logged, and the DSM stays within the accuracy bar
    with coverage parity vs the full-range run."""
    import dataclasses as dc
    import logging

    from aerial_mapper_tpu.camera.rig import CameraRig
    from aerial_mapper_tpu.config import (
        DsmConfig,
        GridMapConfig,
        PipelineConfig,
    )
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat
    from aerial_mapper_tpu.mapgrid.grid import cell_centers
    from aerial_mapper_tpu.pipeline.batch import run_dsm
    from aerial_mapper_tpu.pipeline.dataset import Dataset

    Rs, ts = make_survey_poses(4, altitude=514.0, spacing=6.0)
    images = [
        np.asarray(render_image(SCENE, CAM, jnp.asarray(R, jnp.float32),
                                jnp.asarray(t, jnp.float32)))
        for R, t in zip(Rs, ts)
    ]
    rig = CameraRig(cameras=(CAM,),
                    T_C_B_quats=np.array([[1.0, 0.0, 0.0, 0.0]]),
                    T_C_B_trans=np.zeros((1, 3)))
    ds = Dataset(
        rig=rig,
        quats_G_B=np.asarray(matrix_to_quat(jnp.asarray(Rs)), np.float64),
        trans_G_B=np.asarray(ts), images=images,
    )
    cfg = PipelineConfig(
        auto_shard=False,
        grid=GridMapConfig(center_easting=16.0, center_northing=0.0,
                           delta_easting=60.0, delta_northing=40.0,
                           resolution=1.0),
        stereo=StereoConfig(use_every_nth_image=1,
                            disparity_from_slab=True),
        dsm=DsmConfig(interpolation_radius_sq=2.0),
    )
    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    lg = logging.getLogger("aerial_mapper_tpu")
    h = _Catch()
    lg.addHandler(h)
    old_level = lg.level
    lg.setLevel(logging.INFO)
    try:
        layers, geom = run_dsm(ds, cfg)
    finally:
        lg.removeHandler(h)
        lg.setLevel(old_level)
    assert any("slab-bounded disparity" in m for m in records)
    layers_full, _ = run_dsm(
        ds, dc.replace(cfg, stereo=StereoConfig(use_every_nth_image=1)))
    elev = np.asarray(layers["elevation"])
    elev_full = np.asarray(layers_full["elevation"])
    fin, fin_full = np.isfinite(elev), np.isfinite(elev_full)
    assert fin.sum() > 0.95 * fin_full.sum()
    ce, cn = cell_centers(geom)
    truth = np.asarray(SCENE.height(ce, cn))
    err = np.abs(elev[fin] - truth[fin])
    assert np.median(err) < geom.resolution


def test_disparity_from_slab_incremental_driver():
    """The incremental driver honors disparity_from_slab only with a
    declared z envelope (the sound slab there); without one it warns and
    runs the full search. With the envelope, the bounded result matches
    the full-range driver wherever both accept."""
    import dataclasses as dc
    import logging

    from aerial_mapper_tpu.camera.rig import CameraRig
    from aerial_mapper_tpu.config import (
        DsmConfig,
        GridMapConfig,
        PipelineConfig,
    )
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat
    from aerial_mapper_tpu.pipeline.dataset import Dataset
    from aerial_mapper_tpu.pipeline.incremental import run_incremental

    Rs, ts = make_survey_poses(4, altitude=514.0, spacing=6.0)
    images = [
        np.asarray(render_image(SCENE, CAM, jnp.asarray(R, jnp.float32),
                                jnp.asarray(t, jnp.float32)))
        for R, t in zip(Rs, ts)
    ]
    rig = CameraRig(cameras=(CAM,),
                    T_C_B_quats=np.array([[1.0, 0.0, 0.0, 0.0]]),
                    T_C_B_trans=np.zeros((1, 3)))
    ds = Dataset(
        rig=rig,
        quats_G_B=np.asarray(matrix_to_quat(jnp.asarray(Rs)), np.float64),
        trans_G_B=np.asarray(ts), images=images,
    )

    def run(stereo_cfg):
        cfg = PipelineConfig(
            auto_shard=False,
            grid=GridMapConfig(center_easting=16.0, center_northing=0.0,
                               delta_easting=60.0, delta_northing=40.0,
                               resolution=1.0),
            stereo=stereo_cfg,
            dsm=DsmConfig(interpolation_radius_sq=2.0),
        )
        records = []

        class _Catch(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        lg = logging.getLogger("aerial_mapper_tpu")
        h = _Catch()
        lg.addHandler(h)
        old = lg.level
        lg.setLevel(logging.INFO)
        try:
            layers, _ = run_incremental(ds, cfg, update_every_nth=1)
        finally:
            lg.removeHandler(h)
            lg.setLevel(old)
        return layers, records

    # no envelope: warn + full search
    _, recs = run(StereoConfig(use_every_nth_image=1,
                               disparity_from_slab=True))
    assert any("ignored by the incremental driver" in m for m in recs)

    # with envelope: bounded search logged, coverage parity vs full
    l_slab, recs = run(StereoConfig(use_every_nth_image=1,
                                    disparity_from_slab=True,
                                    z_min=404.0, z_max=424.0))
    assert any("incremental slab-bounded" in m for m in recs)
    l_full, _ = run(StereoConfig(use_every_nth_image=1,
                                 z_min=404.0, z_max=424.0))
    fs = np.isfinite(np.asarray(l_slab["elevation"]))
    ff = np.isfinite(np.asarray(l_full["elevation"]))
    assert fs.sum() > 0.95 * ff.sum()
