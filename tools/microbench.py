#!/usr/bin/env python
"""Micro-benchmark harness for individual kernels on the axon TPU.

Same methodology as bench.py (see docs/PERFORMANCE.md "Timing methodology"):
warm up + compile, drain the queue with a scalar readback, then time
repetitions of [k data-dependent chained calls -> ONE scalar readback] and
keep the minimum window; difference two k values to cancel the per-window
tunnel round-trip constant.

Usage:
    python tools/microbench.py ortho_score      # backward-grid score+texel
    python tools/microbench.py bm               # BM matcher, one pair
    python tools/microbench.py sgm              # SGM matcher, one pair
    python tools/microbench.py idw              # DSM binned IDW, 12.6M pts
    python tools/microbench.py stereo_e2e       # 35-pair batched stereo

Each case prints `<name>: <ms> ms/pass` from the k-slope.
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np  # noqa: E402


def min_window(step, state0, k, reps, readback):
    best = float("inf")
    state = step(state0)
    readback(state)  # drain compile/warm-up backlog
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            state = step(state)
        readback(state)
        best = min(best, time.perf_counter() - t0)
    return best


def slope_ms(step, state0, readback, k_small=8, k_large=40, reps=4):
    t_s = min_window(step, state0, k_small, reps, readback)
    t_l = min_window(step, state0, k_large, reps, readback)
    return max(t_l - t_s, 1e-9) / (k_large - k_small) * 1e3


def _workload(num_images=249, img_w=752, img_h=480, map_cells=400):
    import jax.numpy as jnp

    from aerial_mapper_tpu.camera.models import Camera
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat
    from aerial_mapper_tpu.mapgrid.grid import (
        MapGeometry,
        cell_centers,
        create_map_state,
    )
    from aerial_mapper_tpu.synth.scene import (
        SyntheticScene,
        make_survey_poses,
        render_image,
    )

    cam = Camera(fx=480.0, fy=480.0, cx=img_w / 2.0, cy=img_h / 2.0,
                 width=img_w, height=img_h)
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=6.0)
    Rs, ts = make_survey_poses(
        num_images, altitude=514.0, spacing=200.0 / max(num_images // 2, 1),
        num_lines=2, line_spacing=60.0, start_easting=-100.0,
        start_northing=-30.0,
    )
    images = jnp.stack(
        [render_image(scene, cam, jnp.asarray(R, jnp.float32),
                      jnp.asarray(t, jnp.float32)) for R, t in zip(Rs, ts)]
    )
    # 8-bit imagery like bench.py: uint8 texel gathers, float math after
    images = jnp.clip(jnp.round(images), 0.0, 255.0).astype(jnp.uint8)
    geom = MapGeometry(center_easting=0.0, center_northing=0.0,
                       resolution=0.5, height=map_cells, width=map_cells)
    ce, cn = cell_centers(geom)
    elevation = scene.height(ce, cn)
    layers = dict(create_map_state(geom).layers)
    layers["elevation"] = elevation
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)),
                        jnp.float32)
    return cam, scene, Rs, ts, images, geom, layers, quats


def case_ortho_score():
    import jax.numpy as jnp

    from aerial_mapper_tpu.config import OrthoBackwardGridConfig
    from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update

    cam, scene, Rs, ts, images, geom, layers, quats = _workload()
    ts_j = jnp.asarray(ts, jnp.float32)
    cfg = OrthoBackwardGridConfig()
    step = lambda lay: backward_grid_update(  # noqa: E731
        lay, quats, ts_j, images, geom, cam, cfg)
    ms = slope_ms(step, layers, lambda lay: float(jnp.sum(lay["ortho"])))
    print(f"ortho_score: {ms:.2f} ms/pass "
          f"({geom.height * geom.width / ms / 1e3:.1f} Mcells/s)")


def _pair_setup():
    import jax.numpy as jnp

    from aerial_mapper_tpu.stereo.batched import prepare_pair_operands

    cam, scene, Rs, ts, images, geom, layers, quats = _workload()
    ops = prepare_pair_operands(cam.K, Rs, ts, images, use_every_nth=7,
                                phase=0)  # historical bench workload
    return cam, ops, jnp


def _rectified_pair(ops):
    import jax
    import jax.numpy as jnp

    from aerial_mapper_tpu.image.sample import point_in_quad
    from aerial_mapper_tpu.stereo.batched import _rectify_one

    rect1 = _rectify_one(ops.image1[0], ops.T1_inv[0])
    rect2 = _rectify_one(ops.image2[0], ops.T2_inv[0])
    h, w = rect1.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    mask = point_in_quad(u, v, ops.corners_rect[0])
    return rect1, rect2, mask


def case_bm():
    import jax

    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.stereo.matching import block_matching_disparity

    cam, ops, jnp = _pair_setup()
    rect1, rect2, mask = _rectified_pair(ops)
    cfg = BlockMatchingConfig(num_disparities=int(os.environ.get("MB_NUM_DISP", "64")))

    @jax.jit
    def step(x):
        d = block_matching_disparity(rect1 + x * 1e-30, rect2, mask, cfg)
        return jnp.sum(d) * 1e-9

    ms = slope_ms(step, jnp.float32(0.0), float)
    print(f"bm (752x480x{cfg.num_disparities}): {ms:.2f} ms/pair")


def case_bm_stages():
    """Cumulative-prefix timing of the BM pipeline's internal stages.

    Each step returns a scalar from a PREFIX of the pipeline; differencing
    consecutive prefixes attributes time to the added stage (fusion across
    the cut is lost, so treat the split as approximate).
    """
    import jax

    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.stereo import matching as M

    cam, ops, jnp = _pair_setup()
    rect1, rect2, mask = _rectified_pair(ops)
    cfg = BlockMatchingConfig(num_disparities=int(os.environ.get("MB_NUM_DISP", "64")))
    h, w = rect1.shape

    def prefix(stage):
        @jax.jit
        def step(x):
            lf = M._xsobel_prefilter(rect1 + x * 1e-30, cfg.pre_filter_cap)
            rf = M._xsobel_prefilter(rect2, cfg.pre_filter_cap)
            cost = M._cost_volume_sad(
                lf, rf, cfg.num_disparities, cfg.min_disparity,
                cfg.block_size)
            border = M._border_mask(h, w, cfg.num_disparities,
                                    cfg.min_disparity)
            cost = jnp.where(border, cost, M._BIG)
            if stage == "cost":
                return jnp.sum(cost) * 1e-12
            disp, c0, best = M._wta_subpixel(cost, cfg.min_disparity)
            if stage == "wta":
                return jnp.sum(disp + c0) * 1e-9
            valid = M._uniqueness_mask(cost, best, c0, cfg.uniqueness_ratio)
            if stage == "uniq":
                return jnp.sum(disp + valid) * 1e-9
            valid &= M._lr_consistency_mask(cost, best, cfg.min_disparity)
            if stage == "lr":
                return jnp.sum(disp + valid) * 1e-9
            texture = M._box_filter(jnp.abs(lf - cfg.pre_filter_cap),
                                    cfg.block_size)
            valid &= texture >= cfg.texture_threshold * cfg.block_size
            valid &= mask & jnp.any(border, axis=0)
            valid = M._speckle_mask(disp, valid, cfg.speckle_window_size,
                                    cfg.speckle_range)
            return jnp.sum(jnp.where(valid, disp, M.INVALID_DISPARITY)) * 1e-9
        return step

    prev = 0.0
    for stage in ("cost", "wta", "uniq", "lr", "full"):
        ms = slope_ms(prefix(stage), jnp.float32(0.0), float)
        print(f"bm_stages {stage}: {ms:.2f} ms cumulative "
              f"(+{ms - prev:.2f})")
        prev = ms


def case_bm_cost_stages():
    """Split the SAD cost build: shear+|diff| vs each box-filter axis."""
    import jax

    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.stereo import matching as M

    cam, ops, jnp = _pair_setup()
    rect1, rect2, mask = _rectified_pair(ops)
    cfg = BlockMatchingConfig(num_disparities=int(os.environ.get("MB_NUM_DISP", "64")))

    def prefix(stage):
        @jax.jit
        def step(x):
            lf = M._xsobel_prefilter(rect1 + x * 1e-30, cfg.pre_filter_cap)
            rf = M._xsobel_prefilter(rect2, cfg.pre_filter_cap)
            r_stack = M._shifted_right(rf, cfg.num_disparities,
                                       cfg.min_disparity)
            ad = jnp.abs(lf[None, :, :] - r_stack)
            if stage == "ad":
                return jnp.sum(ad) * 1e-12
            bh = M._box_filter(ad, cfg.block_size, axes=(-2,))
            if stage == "box_h":
                return jnp.sum(bh) * 1e-12
            bw = M._box_filter(bh, cfg.block_size, axes=(-1,))
            return jnp.sum(bw) * 1e-12
        return step

    prev = 0.0
    for stage in ("ad", "box_h", "box_w"):
        ms = slope_ms(prefix(stage), jnp.float32(0.0), float)
        print(f"bm_cost_stages {stage}: {ms:.2f} ms cumulative "
              f"(+{ms - prev:.2f})")
        prev = ms


def case_speckle():
    """VERDICT r2 #7: measured cost of the reference-parity connected-
    component speckle filter vs the windowed approximation at production
    scale (752x480), so the documented quality/speed tradeoff
    (stereo/matching.py _speckle_mask_cc) has a real TPU number."""
    import jax

    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.stereo.matching import block_matching_disparity

    cam, ops, jnp = _pair_setup()
    rect1, rect2, mask = _rectified_pair(ops)
    nd = int(os.environ.get("MB_NUM_DISP", "64"))
    for mode in ("windowed", "cc"):
        cfg = BlockMatchingConfig(num_disparities=nd, speckle_mode=mode)

        @jax.jit
        def step(x, cfg=cfg):
            d = block_matching_disparity(rect1 + x * 1e-30, rect2, mask,
                                         cfg)
            return jnp.sum(d) * 1e-9

        ms = slope_ms(step, jnp.float32(0.0), float)
        print(f"bm speckle_mode={mode} (752x480x{nd}): {ms:.2f} ms/pair")


def case_sgm():
    """SGM matcher cost; MB_NUM_DISP and MB_SGM_DIRS select the config —
    the production default is 80 disparities x 8 directions
    (SgmConfig, config.py)."""
    import jax

    from aerial_mapper_tpu.config import SgmConfig
    from aerial_mapper_tpu.stereo.matching import sgm_disparity

    cam, ops, jnp = _pair_setup()
    rect1, rect2, mask = _rectified_pair(ops)
    d_num = int(os.environ.get("MB_NUM_DISP", "80"))
    dirs = int(os.environ.get("MB_SGM_DIRS", "8"))
    unroll = int(os.environ.get("MB_SGM_UNROLL", "4"))
    cfg = SgmConfig(num_disparities=d_num, num_directions=dirs,
                    scan_unroll=unroll)

    @jax.jit
    def step(x):
        d = sgm_disparity(rect1 + x * 1e-30, rect2, mask, cfg)
        return jnp.sum(d) * 1e-9

    ms = slope_ms(step, jnp.float32(0.0), float)
    print(f"sgm (752x480x{d_num}, {dirs} dir, unroll {unroll}): "
          f"{ms:.2f} ms/pair")


def case_rectify():
    """A/B: the pair's two rectification remaps as today (2 gathers of
    HW indices each) vs ONE combined gather from a stacked [2, H, W, 4]
    source (same 2*HW total indices; tests whether op count or index
    count sets the cost — VERDICT r3 #8)."""
    import jax

    cam, ops, jnp = _pair_setup()
    img1, img2 = ops.image1[0], ops.image2[0]
    T1i, T2i = ops.T1_inv[0], ops.T2_inv[0]
    from aerial_mapper_tpu.stereo.batched import _rectify_one

    @jax.jit
    def step_sep(x):
        r1 = _rectify_one(img1.astype(jnp.float32) + x * 1e-30, T1i)
        r2 = _rectify_one(img2.astype(jnp.float32) + x * 1e-30, T2i)
        return (jnp.sum(r1) + jnp.sum(r2)) * 1e-9

    h, w = img1.shape

    def coords(T_inv):
        v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        x = T_inv[0, 0] * u + T_inv[0, 1] * v + T_inv[0, 2]
        y = T_inv[1, 0] * u + T_inv[1, 1] * v + T_inv[1, 2]
        z = T_inv[2, 0] * u + T_inv[2, 1] * v + T_inv[2, 2]
        z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        return x / z, y / z

    @jax.jit
    def step_fused(x):
        pair = jnp.stack([img1, img2])  # [2, H, W] uint8
        right = jnp.roll(pair, -1, axis=2)
        down = jnp.roll(pair, -1, axis=1)
        downright = jnp.roll(right, -1, axis=1)
        quad = jnp.stack([pair, right, down, downright], axis=-1)
        u1, v1 = coords(T1i + x * 1e-30)
        u2, v2 = coords(T2i)
        uu = jnp.stack([u1, u2])
        vv = jnp.stack([v1, v2])
        u0 = jnp.floor(uu)
        v0 = jnp.floor(vv)
        fu, fv = uu - u0, vv - v0
        iu0 = jnp.clip(u0.astype(jnp.int32), 0, w - 1)
        iv0 = jnp.clip(v0.astype(jnp.int32), 0, h - 1)
        b = jnp.arange(2, dtype=jnp.int32)[:, None, None]
        q = quad[b, iv0, iu0].astype(jnp.float32)  # ONE gather, 2HW idx
        top = q[..., 0] * (1.0 - fu) + q[..., 1] * fu
        bot = q[..., 2] * (1.0 - fu) + q[..., 3] * fu
        out = top * (1.0 - fv) + bot * fv
        inside = (uu >= 0) & (vv >= 0) & (uu <= w - 1.0) & (vv <= h - 1.0)
        out = jnp.where(inside, out, 0.0)
        return jnp.sum(out) * 1e-9

    ms_sep = slope_ms(step_sep, jnp.float32(0.0), float)
    ms_fused = slope_ms(step_fused, jnp.float32(0.0), float)
    print(f"rectify pair: separate {ms_sep:.2f} ms, one combined gather "
          f"{ms_fused:.2f} ms")


def case_plane_sweep():
    """Plane-sweep MVS densifier: one reference view at the bench image
    scale; MB_PS_PLANES / MB_PS_NEIGHBORS select the sweep size."""
    import jax

    from aerial_mapper_tpu.config import PlaneSweepConfig
    from aerial_mapper_tpu.stereo.plane_sweep import plane_sweep_elevation

    import jax.numpy as jnp

    cam, scene, Rs, ts, images, geom, layers, quats = _workload()
    k = int(os.environ.get("MB_PS_PLANES", "48"))
    m = int(os.environ.get("MB_PS_NEIGHBORS", "2"))
    cfg = PlaneSweepConfig(z_min=374.0, z_max=454.0, num_planes=k,
                           num_neighbors=m)
    ri = 2
    nbrs = [ri - 1, ri + 1][:m] if m <= 2 else \
        [ri - 1, ri + 1, ri - 2, ri + 2][:m]
    R_cw = np.transpose(np.asarray(Rs), (0, 2, 1))
    # float32 operands by default: uint8 PARAMETERS of this large scan
    # program hit the axon per-call relayout quirk (CLAUDE.md) and measure
    # WORSE despite the cheaper gathers (295.1 vs 249.3 ms/view A/B'd
    # round 4); MB_PS_U8=1 selects the uint8 arm. The production batched
    # path keeps uint8 anyway: it executes ONCE per run, so a single
    # relayout beats 4x the host-link bytes.
    if os.environ.get("MB_PS_U8"):
        ref = images[ri]
        nbr = images[jnp.asarray(nbrs)]
    else:
        ref = images[ri].astype(jnp.float32)
        nbr = images[jnp.asarray(nbrs)].astype(jnp.float32)

    @jax.jit
    def step(x):
        res = plane_sweep_elevation(
            ref + x * 1e-30, jnp.asarray(Rs[ri], jnp.float32),
            jnp.asarray(ts[ri], jnp.float32), nbr,
            jnp.asarray(R_cw[nbrs], jnp.float32),
            jnp.asarray(np.asarray(ts)[nbrs], jnp.float32), cam, cfg)
        return jnp.nansum(res.cost) * 1e-9

    ms = slope_ms(step, jnp.float32(0.0), float, k_small=2, k_large=8,
                  reps=3)
    print(f"plane_sweep (752x480, {k} planes x {len(nbrs)} views): "
          f"{ms:.1f} ms/ref-view")


def case_stereo_e2e():
    import jax

    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.stereo.batched import process_pairs_batched

    cam, ops, jnp = _pair_setup()
    cfg = BlockMatchingConfig(num_disparities=int(os.environ.get("MB_NUM_DISP", "64")))
    chunk = int(os.environ.get("MB_BATCH_CHUNK", "1"))

    @jax.jit
    def step(x):
        o = ops._replace(T1_inv=ops.T1_inv + x * 1e-30)
        pts, intens, valid = process_pairs_batched(
            o, cam, matcher="bm", bm_cfg=cfg, batch_chunk=chunk)
        return jnp.sum(pts) * 1e-12

    n_pairs = ops.image1.shape[0]
    ms = slope_ms(step, jnp.float32(0.0), float, k_small=2, k_large=8,
                  reps=3)
    print(f"stereo_e2e ({n_pairs} pairs, chunk={chunk}): {ms:.1f} ms "
          f"({ms / n_pairs:.2f} ms/pair)")


def case_idw():
    import jax

    from aerial_mapper_tpu.config import BlockMatchingConfig, DsmConfig
    from aerial_mapper_tpu.dsm.idw import idw_to_grid
    from aerial_mapper_tpu.stereo.batched import process_pairs_batched

    import jax.numpy as jnp

    cam, scene, Rs, ts, images, geom, layers, quats = _workload()
    from aerial_mapper_tpu.stereo.batched import prepare_pair_operands

    ops = prepare_pair_operands(cam.K, Rs, ts, images, use_every_nth=7,
                                phase=0)  # historical bench workload
    pts, intens, valid = process_pairs_batched(
        ops, cam, matcher="bm",
        bm_cfg=BlockMatchingConfig(num_disparities=int(os.environ.get("MB_NUM_DISP", "64"))), batch_chunk=1)
    p = pts.reshape(-1, 3)
    v = valid.reshape(-1)
    cfg = DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8)

    @jax.jit
    def step(x):
        values, hit = idw_to_grid(
            p[:, :2] + x * 1e-30, p[:, 2], v, geom, cfg.bin_capacity,
            radius_sq=cfg.interpolation_radius_sq, adaptive=True,
            growth=1.1, max_radius_sq=7.0)
        return jnp.sum(jnp.where(hit, values, 0.0)) * 1e-9

    ms = slope_ms(step, jnp.float32(0.0), float, k_small=2, k_large=10,
                  reps=3)
    print(f"idw ({p.shape[0] / 1e6:.1f}M points): {ms:.1f} ms")


def case_homog():
    """Forward-homography feather mosaic: full-mosaic vs windowed warp."""
    import dataclasses

    import jax

    from aerial_mapper_tpu.config import OrthoHomographyConfig
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat
    from aerial_mapper_tpu.ortho.homography import homography_mosaic_batch
    from aerial_mapper_tpu.pipeline.batch import _homography_auto_window

    import jax.numpy as jnp

    cam, scene, Rs, ts, images, geom, layers, quats = _workload()
    images_f = images.astype(jnp.float32)
    ts_j = jnp.asarray(ts, jnp.float32)
    cfg = OrthoHomographyConfig(
        ground_plane_elevation_m=414.0, width_mosaic_pixels=1000,
        height_mosaic_pixels=1000, resolution=1.0, origin=(0.0, 0.0, 0.0),
    )
    n = images.shape[0]
    for label, c in (
        ("full", cfg),
        ("windowed", None),
    ):
        if c is None:
            win = _homography_auto_window(cfg, cam, np.asarray(quats), ts)
            if win is None:
                print("homog windowed: auto window unavailable")
                continue
            c = dataclasses.replace(cfg, window_rows=win[0],
                                    window_cols=win[1])
            print(f"homog window: {win[0]}x{win[1]}")

        # images ride as an operand: a closed-over stack becomes a 360 MB
        # HLO constant and the axon remote-compile endpoint rejects the
        # upload (HTTP 413)
        @jax.jit
        def step_op(x, imgs, c=c):
            m = homography_mosaic_batch(
                imgs + x * 1e-30, quats, ts_j, cam, c,
                needs_undistortion=False)
            return jnp.sum(m) * 1e-9

        step = lambda x: step_op(x, images_f)  # noqa: E731
        ms = slope_ms(step, jnp.float32(0.0), float, k_small=1, k_large=4,
                      reps=3)
        print(f"homog {label} ({n} images, 1000x1000): {ms:.0f} ms "
              f"({n / ms * 1e3:.0f} images/s)")


def case_idw_stages():
    """Split the DSM stage: binning (sort + slot gather) vs accumulation."""
    import jax

    from aerial_mapper_tpu.config import BlockMatchingConfig, DsmConfig
    from aerial_mapper_tpu.dsm.idw import (
        _window_halfwidth,
        bin_points,
        binned_idw,
    )
    from aerial_mapper_tpu.mapgrid.grid import MapGeometry
    from aerial_mapper_tpu.stereo.batched import (
        prepare_pair_operands,
        process_pairs_batched,
    )

    import jax.numpy as jnp

    cam, scene, Rs, ts, images, geom, layers, quats = _workload()
    ops = prepare_pair_operands(cam.K, Rs, ts, images, use_every_nth=7,
                                phase=0)  # historical bench workload
    pts, intens, valid = process_pairs_batched(
        ops, cam, matcher="bm",
        bm_cfg=BlockMatchingConfig(num_disparities=int(os.environ.get("MB_NUM_DISP", "64"))), batch_chunk=1)
    p = pts.reshape(-1, 3)
    v = valid.reshape(-1)
    cfg = DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8)
    halo = _window_halfwidth(cfg.max_radius_sq, geom.resolution)
    ext_geom = MapGeometry(
        geom.center_easting, geom.center_northing, geom.resolution,
        geom.height + 2 * halo, geom.width + 2 * halo,
    )

    @jax.jit
    def step_bin(x):
        b = bin_points(p[:, :2] + x * 1e-30, p[:, 2], v, ext_geom,
                       cfg.bin_capacity, north=geom.north, west=geom.west,
                       row_offset=halo, col_offset=halo)
        return (jnp.sum(b.payload) + jnp.sum(b.count)) * 1e-9

    ms_bin = slope_ms(step_bin, jnp.float32(0.0), float, k_small=2,
                      k_large=10, reps=3)
    print(f"idw_stages bin ({p.shape[0] / 1e6:.1f}M pts): {ms_bin:.1f} ms")

    binned = jax.jit(
        lambda: bin_points(p[:, :2], p[:, 2], v, ext_geom, cfg.bin_capacity,
                           north=geom.north, west=geom.west,
                           row_offset=halo, col_offset=halo)
    )()

    @jax.jit
    def step_acc(x):
        vals, hit = binned_idw(
            binned._replace(de=binned.de + x * 1e-30), ext_geom,
            radius_sq=cfg.interpolation_radius_sq, adaptive=True,
            growth=1.1, max_radius_sq=7.0)
        return jnp.sum(jnp.where(hit, vals, 0.0)) * 1e-9

    ms_acc = slope_ms(step_acc, jnp.float32(0.0), float, k_small=2,
                      k_large=10, reps=3)
    print(f"idw_stages accumulate: {ms_acc:.1f} ms")


CASES = {
    "ortho_score": case_ortho_score,
    "bm": case_bm,
    "bm_stages": case_bm_stages,
    "bm_cost_stages": case_bm_cost_stages,
    "sgm": case_sgm,
    "speckle": case_speckle,
    "idw": case_idw,
    "idw_stages": case_idw_stages,
    "homog": case_homog,
    "stereo_e2e": case_stereo_e2e,
    "rectify": case_rectify,
    "plane_sweep": case_plane_sweep,
}


if __name__ == "__main__":
    names = sys.argv[1:] or ["ortho_score"]
    for name in names:
        CASES[name]()
