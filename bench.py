#!/usr/bin/env python
"""Benchmark: backward-grid orthomosaic throughput (Mcells/s) per chip.

Headline metric (BASELINE.json): the backward-grid ortho kernel — the
reference system's dominant cost (O(cells x images) loops,
ortho-backward-grid.cc:56-121) — on a cadastre-scale workload:
249 images at 752x480, a 400x400-cell map at 0.5 m. The denominator is the
measured native C++ baseline (native/reference_baseline.cc): the same loops
with the reference's std::thread parFor on all host cores — the reference
repo itself publishes no numbers (BASELINE.md).

Timing methodology (axon TPU tunnel quirks, see .claude/skills/verify):
``block_until_ready`` does not reliably block, and the tunnel's first
queue flush after a large enqueue backlog can stall for tens of seconds
with huge run-to-run variance (measured: the same k=8 chain 9.8 s vs
50.7 s in back-to-back worker runs). Each measurement therefore (1) warms
up/compiles, (2) DRAINS the queue with a scalar readback, then (3) times
several repetitions of [enqueue k data-dependent kernel calls -> pull one
scalar] and keeps the MINIMUM window; two k values are differenced inside
the same process to cancel the per-window round-trip constant.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NUM_IMAGES = int(os.environ.get("BENCH_NUM_IMAGES", "249"))
IMG_W = int(os.environ.get("BENCH_IMG_W", "752"))
IMG_H = int(os.environ.get("BENCH_IMG_H", "480"))
MAP_CELLS = int(os.environ.get("BENCH_MAP_CELLS", "400"))
RESOLUTION = 0.5
# reference default: 80 disparities (common.h:85,99) — both the TPU and the
# CPU-reference e2e pipelines run it (round 1 ran 64; VERDICT r1 #8)
NUM_DISP = int(os.environ.get("BENCH_NUM_DISP", "80"))

# Canonical idle-host CPU denominators (VERDICT r3 #5): the live per-run
# CPU baseline swings >2x with host load, so the headline ratio is anchored
# to a properly measured constant — median of N runs on an idle host with
# recorded provenance (tools/cpu_baseline.py; numbers + provenance in
# BASELINE.md "Canonical CPU denominators"). The live same-run pairing is
# still reported as vs_live_cpu for drift detection.
# Measured 2026-08-21, idle host (2 cores, loadavg 0.015), median of 7/3
# runs: ortho 0.240-0.268 s (tight); e2e runs 15.2 (cold first run — what
# the earlier per-round single-shot denominators were), 9.25, 9.10 s.
CANONICAL_CPU_ORTHO_S = 0.258  # native parFor backward-grid pass, seconds
CANONICAL_CPU_E2E_S = 9.251  # cv2.StereoBM + native loops e2e, seconds


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# worker mode: build workload, warm up, time k chained calls, print seconds
# ---------------------------------------------------------------------------


def _build_workload():
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

    cam = Camera(fx=480.0, fy=480.0, cx=IMG_W / 2.0, cy=IMG_H / 2.0,
                 width=IMG_W, height=IMG_H)
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=6.0)
    Rs, ts = make_survey_poses(
        NUM_IMAGES, altitude=514.0, spacing=200.0 / max(NUM_IMAGES // 2, 1),
        num_lines=2, line_spacing=60.0, start_easting=-100.0,
        start_northing=-30.0,
    )
    # Imagery is 8-bit end to end (the native loader's output format); the
    # synthetic renders are quantized once so the TPU gathers uint8 texels
    # while the CPU baseline reads the SAME values as float32 — identical
    # workload data, each side in its natural layout.
    #
    # The rendered workload is cached on disk: every worker subprocess
    # otherwise re-renders 249 images THROUGH THE TUNNEL, and a degraded
    # tunnel window (queue flushes of tens of seconds, CLAUDE.md) can blow
    # a worker's whole timeout on workload construction alone.
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache",
        f"workload_{NUM_IMAGES}_{IMG_W}x{IMG_H}_{MAP_CELLS}.npz",
    )
    if os.path.exists(cache):
        z = np.load(cache)
        images_np, elevation_np = z["images"], z["elevation"]
        Rs, ts = z["Rs"], z["ts"]
        images = jnp.asarray(images_np)
    else:
        images = jnp.stack(
            [
                render_image(scene, cam, jnp.asarray(R, jnp.float32),
                             jnp.asarray(t, jnp.float32))
                for R, t in zip(Rs, ts)
            ]
        )
        images = jnp.clip(jnp.round(images), 0.0, 255.0).astype(jnp.uint8)
        geom0 = MapGeometry(center_easting=0.0, center_northing=0.0,
                            resolution=RESOLUTION, height=MAP_CELLS,
                            width=MAP_CELLS)
        ce0, cn0 = cell_centers(geom0)
        elevation_np = np.asarray(scene.height(ce0, cn0))
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        # np.savez appends .npz to names without it — keep the suffix
        tmp = cache[:-4] + f".tmp{os.getpid()}.npz"
        np.savez(tmp, images=np.asarray(images),
                 elevation=elevation_np, Rs=np.asarray(Rs),
                 ts=np.asarray(ts))
        os.replace(tmp, cache)
    geom = MapGeometry(center_easting=0.0, center_northing=0.0,
                       resolution=RESOLUTION, height=MAP_CELLS,
                       width=MAP_CELLS)
    ce, cn = cell_centers(geom)
    elevation = jnp.asarray(elevation_np, jnp.float32)
    layers = dict(create_map_state(geom).layers)
    layers["elevation"] = elevation
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)),
                        jnp.float32)
    ts_j = jnp.asarray(ts, jnp.float32)
    return cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, \
        quats, ts_j


def _min_window(step, state0, k: int, reps: int, readback,
                budget_s: float = 240.0) -> float:
    """Min wall-time over up to ``reps`` windows of [k chained calls ->
    readback].

    ``readback(state) -> float`` pulls one scalar, ending the window when
    the device has finished every enqueued program. The queue is drained
    before each window so stale backlog (and its wildly variable tunnel
    flush latency) never lands inside a timed region.

    ``budget_s`` bounds the TOTAL time spent collecting windows: under a
    degraded tunnel every readback can stall for tens of seconds, and a
    fixed rep count then blows the worker timeout with no number at all.
    At least one window is always measured; later reps are skipped once
    the budget is spent (a noisier min beats a timeout).
    """
    best = float("inf")
    # true drain: run one step and read it back, so compile/warm-up backlog
    # is flushed even when state0 is an already-committed constant (a bare
    # readback(state0) would enqueue nothing and flush nothing)
    t_start = time.perf_counter()
    state = step(state0)
    readback(state)
    for r in range(reps):
        if r > 0 and time.perf_counter() - t_start > budget_s:
            log(f"_min_window: budget {budget_s:.0f}s spent after {r} "
                f"reps (degraded tunnel?); keeping current min")
            break
        t0 = time.perf_counter()
        for _ in range(k):
            # single-device FIFO stream: k enqueued programs execute
            # back-to-back; the final scalar pull ends the timed window
            state = step(state)
        readback(state)  # ends this window AND drains for the next one
        best = min(best, time.perf_counter() - t0)
    return best


def worker_ortho(k_small: int, k_large: int):
    import jax
    import jax.numpy as jnp

    from aerial_mapper_tpu.config import OrthoBackwardGridConfig
    from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update

    (cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, quats,
     ts_j) = _build_workload()
    cfg = OrthoBackwardGridConfig()

    # direct production entry point (already jitted); no wrapper compile
    step = lambda lay: backward_grid_update(  # noqa: E731
        lay, quats, ts_j, images, geom, cam, cfg
    )
    readback = lambda lay: float(jnp.sum(lay["ortho"]))  # noqa: E731
    step(layers)  # compile
    t_small = _min_window(step, layers, k_small, reps=4, readback=readback)
    t_large = _min_window(step, layers, k_large, reps=4, readback=readback)
    print(f"RESULT {t_small} {t_large}", flush=True)


def worker_e2e(k: int):
    import jax
    import jax.numpy as jnp

    from aerial_mapper_tpu.config import (
        BlockMatchingConfig,
        DsmConfig,
        OrthoBackwardGridConfig,
    )
    from aerial_mapper_tpu.dsm.idw import idw_to_grid
    from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update
    from aerial_mapper_tpu.stereo.batched import (
        prepare_pair_operands,
        process_pairs_batched,
    )

    from aerial_mapper_tpu.config import SgmConfig

    (cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, quats,
     ts_j) = _build_workload()
    ortho_cfg = OrthoBackwardGridConfig()
    bm_cfg = BlockMatchingConfig(num_disparities=NUM_DISP)
    # BENCH_E2E_MATCHER=sgm runs the reference's SGBM default config
    # (common.h:85-96) through the same end-to-end step
    matcher = os.environ.get("BENCH_E2E_MATCHER", "bm")
    sgm_cfg = SgmConfig(num_disparities=NUM_DISP)
    dsm_cfg = DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8)
    # The uint8 stack is fastest for the standalone ortho program (the
    # texel gather fetches 1-byte texels), but as an operand of THIS
    # combined program XLA re-lays the uint8 parameter out on every call
    # (measured +0.28 s/step vs +0 for float32, while each stage in its
    # own program is faster with uint8). Upcast ONCE on device and feed
    # float32 to both consumers. The same quirk holds (mildly) even for
    # the SMALL uint8 pair stacks (2 x 12 MB): A/B'd 0.474 s/step f32 vs
    # 0.482 s uint8, so f32 operands stay the default
    # (BENCH_E2E_U8_STEREO=1 re-enables the uint8 variant).
    images_u8 = images
    images = images.astype(jnp.float32)
    stereo_src = images_u8 if os.environ.get(
        "BENCH_E2E_U8_STEREO", "0") == "1" else images
    # phase=0 keeps the historical bench workload (frames 0, 7, ... ->
    # 35 pairs); the production default is the reference phase n-1
    ops = prepare_pair_operands(cam.K, Rs, ts, stereo_src,
                                use_every_nth=7, phase=0)

    # BENCH_E2E_SLAB_DISP=1: slab-bounded disparity search (VERDICT r4
    # #7) — derive the elevation slab from a BM prepass (the incremental
    # driver tracks exactly this slab for free), bound the search window
    # to the disparities that slab can produce, and run the SAME e2e
    # step. The matcher + cost-volume passes scale ~linearly with the
    # disparity count.
    if os.environ.get("BENCH_E2E_SLAB_DISP", "0") == "1":
        from aerial_mapper_tpu.stereo.batched import (
            disparity_range_from_slab,
        )
        from aerial_mapper_tpu.stereo.plane_sweep import auto_z_range

        z_lo, z_hi = auto_z_range(list(images), np.asarray(Rs),
                                  np.asarray(ts), cam, bm_cfg=bm_cfg)
        lo, num = disparity_range_from_slab(
            cam.K, np.asarray(Rs), np.asarray(ts), (IMG_H, IMG_W),
            z_lo, z_hi, use_every_nth=7, phase=0,
        )
        log(f"slab-bounded disparity search: slab [{z_lo:.1f}, "
            f"{z_hi:.1f}] m -> disparities [{lo}, {lo + num}) "
            f"({num} vs {NUM_DISP} full)")
        bm_cfg = BlockMatchingConfig(min_disparity=lo,
                                     num_disparities=num)

    u8_internal = os.environ.get("BENCH_E2E_U8_INTERNAL", "0") == "1"

    @jax.jit
    def step(eps, ops, layers, images):
        # data-dependence for call chaining rides the f32 rectification
        # transforms, not the (uint8) images, so dtypes stay native
        o = ops._replace(T1_inv=ops.T1_inv + eps * 1e-30)
        if u8_internal:
            # cast the pair imagery to uint8 INSIDE the program (the
            # imagery is integral-valued): the remap gathers then fetch
            # 4-byte quads instead of 16 while the program PARAMETERS
            # stay f32, dodging the uint8-parameter relayout quirk
            o = o._replace(image1=o.image1.astype(jnp.uint8),
                           image2=o.image2.astype(jnp.uint8))
        pts, intens, valid = process_pairs_batched(
            o, cam, matcher=matcher, bm_cfg=bm_cfg, sgm_cfg=sgm_cfg,
            batch_chunk=1
        )
        p = pts.reshape(-1, 3)
        v = valid.reshape(-1)
        values, hit = idw_to_grid(
            p[:, :2], p[:, 2], v, geom, dsm_cfg.bin_capacity,
            radius_sq=dsm_cfg.interpolation_radius_sq,
            adaptive=True, growth=1.1, max_radius_sq=7.0,
        )
        li = dict(layers)
        li["elevation"] = jnp.where(hit, values, jnp.nan)
        out = backward_grid_update(
            li, quats, ts_j, images, geom, cam, ortho_cfg
        )
        return jnp.sum(out["ortho"]) * 1e-12

    step(jnp.float32(0), ops, layers, images)  # compile
    dt = _min_window(
        lambda eps: step(eps, ops, layers, images),
        jnp.float32(0), k, reps=3, readback=float,
    )

    # one-time (untimed) DSM coverage of the TPU path at bench scale
    pts, _i, valid = process_pairs_batched(
        ops, cam, matcher=matcher, bm_cfg=bm_cfg, sgm_cfg=sgm_cfg,
        batch_chunk=1)
    p = pts.reshape(-1, 3)
    _vals, hit = idw_to_grid(
        p[:, :2], p[:, 2], valid.reshape(-1), geom, dsm_cfg.bin_capacity,
        radius_sq=dsm_cfg.interpolation_radius_sq, adaptive=True,
        growth=1.1, max_radius_sq=7.0,
    )
    cov = float(jnp.mean(hit.astype(jnp.float32)))
    print(f"RESULT {dt} {cov}", flush=True)


def worker_incremental(k: int):
    """Per-update latency of the incremental 'mapping on the fly' mode:
    ONE stereo pair + DSM delta merge + ortho re-rasterization against the
    7-image accumulated subset (main-ortho-backward-grid-incremental.cc:
    143-166 semantics at cadastre scale)."""
    import jax
    import jax.numpy as jnp

    from aerial_mapper_tpu.config import (
        BlockMatchingConfig,
        DsmConfig,
        OrthoBackwardGridConfig,
    )
    from aerial_mapper_tpu.dsm.idw import idw_to_grid
    from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update
    from aerial_mapper_tpu.stereo.batched import (
        prepare_pair_operands,
        process_pairs_batched,
    )

    (cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, quats,
     ts_j) = _build_workload()
    ortho_cfg = OrthoBackwardGridConfig()
    bm_cfg = BlockMatchingConfig(num_disparities=NUM_DISP)
    dsm_cfg = DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8)
    images = images.astype(jnp.float32)
    # one representative update: the latest subsampled pair + the 7-frame
    # image subset accumulated since the previous update (group 17 at the
    # full 249-image scale, clamped for reduced BENCH_NUM_IMAGES configs)
    # the +8 slice end must also exist: clamp base so both frames of the
    # pair are in range even for tiny BENCH_NUM_IMAGES configs
    base = 7 * max(min(17, (NUM_IMAGES - 1) // 7 - 1), 0)
    base = min(base, max(NUM_IMAGES - 8, 0))
    if NUM_IMAGES < 8:
        raise ValueError("BENCH_NUM_IMAGES must be >= 8 for the inc worker")
    sub = slice(base, base + 8, 7)  # e.g. frames 119, 126
    ops = prepare_pair_operands(
        cam.K, Rs[sub], ts[sub], images[sub], use_every_nth=1)
    subset = slice(base, base + 7)  # the 7 newly accumulated frames
    img_sub = images[subset]
    quats_sub = quats[subset]
    ts_sub = ts_j[subset]
    # start from a map state as after many prior updates
    layers = dict(layers)
    layers["elevation"] = elevation

    @jax.jit
    def step(eps, ops, layers, img_sub):
        o = ops._replace(T1_inv=ops.T1_inv + eps * 1e-30)
        pts, _i, valid = process_pairs_batched(
            o, cam, matcher="bm", bm_cfg=bm_cfg, batch_chunk=1)
        p = pts.reshape(-1, 3)
        values, hit = idw_to_grid(
            p[:, :2], p[:, 2], valid.reshape(-1), geom,
            dsm_cfg.bin_capacity,
            radius_sq=dsm_cfg.interpolation_radius_sq,
            adaptive=True, growth=1.1, max_radius_sq=7.0,
        )
        li = dict(layers)
        li["elevation"] = jnp.where(hit, values, layers["elevation"])
        out = backward_grid_update(
            li, quats_sub, ts_sub, img_sub, geom, cam, ortho_cfg
        )
        return jnp.sum(out["ortho"]) * 1e-12

    step(jnp.float32(0), ops, layers, img_sub)  # compile
    dt = _min_window(
        lambda eps: step(eps, ops, layers, img_sub),
        jnp.float32(0), k, reps=3, readback=float,
    )
    print(f"RESULT {dt}", flush=True)


def worker_inc_full():
    """Full incremental driver over the 249-image synthetic sequence —
    host loop, per-update jnp.asarray conversions and all (VERDICT r2 #8:
    'mapping on the fly' measured end-to-end, main-ortho-backward-grid-
    incremental.cc:143-166 at cadastre scale).

    The streaming pass runs THREE times and reports the MEDIAN plus the
    min/max (VERDICT r4 #1: the single-shot number drifted 4.0-9.7 s
    across rounds with tunnel health; a same-run median and range make
    the headline stable and honest). Prints: median_stream n_updates
    prestaged min_stream max_stream."""
    from aerial_mapper_tpu.camera.rig import CameraRig
    from aerial_mapper_tpu.config import (
        BlockMatchingConfig,
        DsmConfig,
        GridMapConfig,
        PipelineConfig,
        StereoConfig,
    )
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat
    from aerial_mapper_tpu.pipeline.dataset import Dataset
    from aerial_mapper_tpu.pipeline.incremental import run_incremental

    (cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, quats,
     ts_j) = _build_workload()
    rig = CameraRig(
        cameras=(cam,),
        T_C_B_quats=np.array([[1.0, 0.0, 0.0, 0.0]]),
        T_C_B_trans=np.zeros((1, 3)),
    )
    dataset = Dataset(
        rig=rig,
        quats_G_B=np.asarray(matrix_to_quat(np.asarray(Rs, np.float64))),
        trans_G_B=np.asarray(ts, np.float64),
        images=list(np.asarray(images, np.float32)),
    )
    cfg = PipelineConfig(
        grid=GridMapConfig(
            center_easting=0.0, center_northing=0.0,
            delta_easting=MAP_CELLS * RESOLUTION,
            delta_northing=MAP_CELLS * RESOLUTION,
            resolution=RESOLUTION,
        ),
        stereo=StereoConfig(use_every_nth_image=1),
        bm=BlockMatchingConfig(num_disparities=NUM_DISP),
        dsm=DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8),
    )
    n_updates = 0

    def count(step, layers, geom):
        nonlocal n_updates
        n_updates += 1

    # warm-up pass over a short prefix compiles every program shape the
    # streaming loop uses (pair step + 7-image ortho subset)
    warm = Dataset(rig=rig, quats_G_B=dataset.quats_G_B[:15],
                   trans_G_B=dataset.trans_G_B[:15],
                   images=dataset.images[:15])
    run_incremental(warm, cfg, update_every_nth=7)
    import jax

    totals = []
    for _rep in range(3):
        n_updates = 0
        t0 = time.perf_counter()
        out_layers, _g = run_incremental(
            dataset, cfg, update_every_nth=7, on_update=count
        )
        # drain: the driver is host-synchronous per update only up to
        # dispatch; force completion of the last update before stopping
        # the clock
        jax.block_until_ready(out_layers)
        float(np.asarray(out_layers["ortho"]).sum())
        totals.append(time.perf_counter() - t0)
    total = float(np.median(totals))

    # prestaged mode: the whole sequence moves to the device in one bulk
    # transfer up front; the loop then measures dispatch + compute (the
    # streaming number above pays one tunnel h2d per arriving frame)
    t0 = time.perf_counter()
    out_pre, _g = run_incremental(
        dataset, cfg, update_every_nth=7, prestage_images=True
    )
    jax.block_until_ready(out_pre)
    float(np.asarray(out_pre["ortho"]).sum())
    total_pre = time.perf_counter() - t0
    print(f"RESULT {total} {n_updates} {total_pre} "
          f"{min(totals)} {max(totals)}", flush=True)


def worker_ba(k: int):
    """Windowed bundle adjustment at survey scale (north-star extension):
    249 cameras on the bench trajectory, ~140k observations of scene
    landmarks, full LM + Schur/PCG solve under one jit."""
    import jax
    import jax.numpy as jnp

    from aerial_mapper_tpu.ba.bundle_adjust import (
        BAProblem,
        BAState,
        bundle_adjust,
    )
    from aerial_mapper_tpu.config import BundleAdjustmentConfig

    (cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, quats,
     ts_j) = _build_workload()
    rng = np.random.default_rng(3)
    n_lms = 3000
    half_e = geom.width * geom.resolution / 2.0
    half_n = geom.height * geom.resolution / 2.0
    le = rng.uniform(-half_e - 80, half_e + 80, n_lms)
    ln = rng.uniform(-half_n - 20, half_n + 20, n_lms)
    lz = np.asarray(scene.height(jnp.asarray(le, jnp.float32),
                                 jnp.asarray(ln, jnp.float32)))
    lms = np.stack([le, ln, lz], axis=1)
    # host-side projection to build the observation list
    Rs_np = np.asarray(Rs, np.float64)
    ts_np = np.asarray(ts, np.float64)
    cam_idx, lm_idx, uvs = [], [], []
    for i in range(Rs_np.shape[0]):
        pc = (lms - ts_np[i]) @ Rs_np[i]  # world->cam (R is cam-to-world)
        z = pc[:, 2]
        u = cam.fx * pc[:, 0] / np.maximum(z, 1e-9) + cam.cx
        v = cam.fy * pc[:, 1] / np.maximum(z, 1e-9) + cam.cy
        ok = (z > 1.0) & (u >= 0) & (u < cam.width) & (v >= 0) \
            & (v < cam.height)
        idx = np.nonzero(ok)[0]
        cam_idx.append(np.full(idx.size, i, np.int32))
        lm_idx.append(idx.astype(np.int32))
        uvs.append(np.stack([u[idx], v[idx]], axis=1))
    cam_idx = np.concatenate(cam_idx)
    lm_idx = np.concatenate(lm_idx)
    uvs = np.concatenate(uvs) + rng.normal(0.0, 0.5, (cam_idx.size, 2))
    log(f"BA problem: {Rs_np.shape[0]} cams, {n_lms} lms, "
        f"{cam_idx.size} obs")

    from aerial_mapper_tpu.geo.se3 import matrix_to_quat

    quats_np = np.asarray(matrix_to_quat(jnp.asarray(Rs_np, jnp.float64)))
    # perturb poses like a noisy PIX4D prior
    t_noisy = ts_np + rng.normal(0.0, 0.5, ts_np.shape)
    state = BAState(
        quats=jnp.asarray(quats_np, jnp.float32),
        trans=jnp.asarray(t_noisy, jnp.float32),
        landmarks=jnp.asarray(
            lms + rng.normal(0.0, 0.5, lms.shape), jnp.float32),
    )
    problem = BAProblem(
        cam_idx=jnp.asarray(cam_idx),
        lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uvs, jnp.float32),
        valid=jnp.ones(cam_idx.size, bool),
    )
    cfg = BundleAdjustmentConfig(max_iterations=10)

    @jax.jit
    def step(eps):
        st = state._replace(trans=state.trans + eps * 1e-30)
        out = bundle_adjust(st, problem, cam, cfg)
        return jnp.sum(out.trans) * 1e-9

    step(jnp.float32(0))  # compile
    dt = _min_window(step, jnp.float32(0), k, reps=3, readback=float)
    print(f"RESULT {dt}", flush=True)


def worker_e2e_cpu():
    """Faithful CPU reference end-to-end (OpenCV BM + native parFor loops)."""
    import jax

    from aerial_mapper_tpu.testing.cpu_pipeline import (
        run_reference_pipeline_cpu,
    )

    (cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, quats,
     ts_j) = _build_workload()
    images_np = np.asarray(images, np.float32)
    t0 = time.perf_counter()
    elev_cpu, ortho_cpu, timings = run_reference_pipeline_cpu(
        cam.K, np.asarray(Rs, np.float64), np.asarray(ts, np.float64),
        images_np, geom, use_every_nth=7, num_disparities=NUM_DISP,
    )
    total = time.perf_counter() - t0
    cov = float(np.isfinite(elev_cpu).mean())
    print(f"RESULT {total} {timings['stereo']} {timings['dsm']} "
          f"{timings['ortho']} {cov}", flush=True)


def worker_agreement():
    """TPU vs native-CPU output agreement + CPU baseline timing.

    Covers BOTH rasterizers: the backward-grid ortho (given the same
    elevation) and the DSM itself — the binned nearest-K IDW at bench
    density (~70 points/cell, deep in the capacity-clipped regime) vs the
    native all-neighbors reference loop (dsm_idw_baseline)."""
    import jax
    import jax.numpy as jnp

    from aerial_mapper_tpu.config import DsmConfig, OrthoBackwardGridConfig
    from aerial_mapper_tpu.dsm.idw import idw_to_grid
    from aerial_mapper_tpu.native import backward_grid_cpu, dsm_idw_cpu
    from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update

    (cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, quats,
     ts_j) = _build_workload()
    cfg = OrthoBackwardGridConfig()
    out = jax.jit(
        lambda lay, img: backward_grid_update(lay, quats, ts_j, img, geom,
                                              cam, cfg)
    )(layers, images)
    ortho_tpu = np.asarray(out["ortho"]).ravel()

    cells_np = np.stack(
        [np.asarray(ce, np.float64).ravel(),
         np.asarray(cn, np.float64).ravel(),
         np.asarray(elevation, np.float64).ravel()], axis=1,
    )
    R_cw = np.transpose(Rs, (0, 2, 1))
    images_np = np.asarray(images, np.float32)
    t0 = time.perf_counter()
    o_cpu, a_cpu, _ = backward_grid_cpu(
        cells_np, R_cw, ts, images_np, cam.fx, cam.fy, cam.cx, cam.cy,
    )
    t_cpu = time.perf_counter() - t0
    both = (a_cpu > 0) & np.isfinite(ortho_tpu)
    agree = float(np.mean(np.abs(ortho_tpu[both] - o_cpu[both]) < 2.0)) \
        if both.any() else 0.0

    # DSM agreement at bench density: same synthetic cloud through the TPU
    # binned nearest-K IDW (production config) and the native all-neighbors
    # loop. ~70 points/cell => every cell is capacity-clipped.
    dsm_cfg = DsmConfig(interpolation_radius_sq=2.0)
    rng = np.random.default_rng(7)
    n_pts = 70 * geom.height * geom.width
    half_e = geom.width * geom.resolution / 2.0
    half_n = geom.height * geom.resolution / 2.0
    pe = rng.uniform(-half_e, half_e, n_pts)
    pn = rng.uniform(-half_n, half_n, n_pts)
    pz = np.asarray(
        scene.height(jnp.asarray(pe, jnp.float32),
                     jnp.asarray(pn, jnp.float32))
    ) + rng.normal(0.0, 0.15, n_pts)
    vals, hit = jax.jit(
        lambda xy, z: idw_to_grid(
            xy, z, jnp.ones(n_pts, bool), geom, dsm_cfg.bin_capacity,
            radius_sq=dsm_cfg.interpolation_radius_sq,
            adaptive=dsm_cfg.adaptive_interpolation,
            growth=dsm_cfg.adaptive_growth_factor,
            max_radius_sq=dsm_cfg.max_radius_sq,
        )
    )(
        jnp.asarray(np.stack([pe, pn], 1), jnp.float32),
        jnp.asarray(pz, jnp.float32),
    )
    dsm_tpu = np.asarray(vals).ravel()
    hit_tpu = np.asarray(hit).ravel()
    ref_vals, ref_hit = dsm_idw_cpu(
        np.stack([pe, pn, pz], axis=1),
        np.asarray(ce, np.float64).ravel(),
        np.asarray(cn, np.float64).ravel(),
        radius_sq=dsm_cfg.interpolation_radius_sq,
        adaptive=dsm_cfg.adaptive_interpolation,
        growth=dsm_cfg.adaptive_growth_factor,
        max_radius_sq=dsm_cfg.max_radius_sq,
    )
    # report the DSM comparison as DATA, never raise: a marginal DSM
    # disagreement must not kill the CPU-baseline row and null out
    # vs_baseline (VERDICT r2 weak #5). hit-mask divergence is reported as
    # a mismatch fraction; value error over the jointly-hit cells.
    hit_mismatch = float((hit_tpu != ref_hit).mean())
    both_hit = hit_tpu & ref_hit
    if both_hit.any():
        err = np.abs(dsm_tpu[both_hit] - ref_vals[both_hit])
        dsm_rmse = float(np.sqrt((err**2).mean()))
        dsm_max = float(err.max())
    else:
        dsm_rmse = dsm_max = float("nan")
    print(f"RESULT {t_cpu} {agree} {dsm_rmse} {dsm_max} {hit_mismatch}",
          flush=True)


def _spawn(mode: str, timeout=1100, extra_env=None) -> list:
    env = dict(os.environ, BENCH_WORKER=mode, **(extra_env or {}))
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT"):
            return [float(x) for x in line.split()[1:]]
    log(f"worker {mode} failed:\n{proc.stderr[-2000:]}")
    raise RuntimeError(f"worker {mode} produced no RESULT")


def main():
    # persistent compile cache: workers are separate processes; without it
    # every worker pays minutes of XLA compilation
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
    mode = os.environ.get("BENCH_WORKER")
    if mode:
        kind, _, k = mode.partition(":")
        if kind == "ortho":
            ka, _, kb = k.partition(":")
            worker_ortho(int(ka), int(kb))
        elif kind == "e2e":
            worker_e2e(int(k))
        elif kind == "inc":
            worker_incremental(int(k))
        elif kind == "inc_full":
            worker_inc_full()
        elif kind == "ba":
            worker_ba(int(k))
        elif kind == "e2e_cpu":
            worker_e2e_cpu()
        elif kind == "agree":
            worker_agreement()
        return

    mcells = MAP_CELLS * MAP_CELLS / 1e6

    # Global wall-clock budget (VERDICT r2 #1: round 2's bench was killed
    # by the driver at rc=124 before printing its JSON line). The headline
    # JSON is printed IMMEDIATELY after the ortho + agreement workers;
    # every optional row is gated on the remaining budget and SKIPPED (not
    # retried) once it is spent, so the process always exits 0 well inside
    # the driver window.
    t_main0 = time.monotonic()
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "1200"))

    def remaining() -> float:
        return deadline_s - (time.monotonic() - t_main0)

    def spawn_dl(mode: str, floor: float = 120.0, retry: bool = False,
                 extra_env=None):
        """Deadline-gated worker spawn: returns the RESULT floats or None
        (skipped / failed); never raises, never outlives the budget.

        With ``retry`` the first attempt is capped at roughly half the
        remaining budget so a tunnel-stalled attempt cannot starve the
        retry (round-3 lesson: a 1100 s first attempt left the retry
        70 s and the round a null headline)."""
        rem = remaining()
        if rem < floor:
            log(f"skip {mode}: {rem:.0f}s of budget left (< {floor:.0f}s)")
            return None
        first_cap = (rem - 30.0) / 2.0 if retry else rem - 30.0
        try:
            return _spawn(mode, timeout=max(60.0, min(1100.0, first_cap)),
                          extra_env=extra_env)
        except Exception as e:  # noqa: BLE001
            log(f"{mode} worker failed: {type(e).__name__}: {e}")
            if retry and remaining() > floor:
                # one retry for TPU workers: the axon remote compiler's
                # latency is wildly variable; the retry hits the
                # persistent compile cache
                try:
                    return _spawn(
                        mode,
                        timeout=max(60.0, min(1100.0, remaining() - 30.0)),
                        extra_env=extra_env,
                    )
                except Exception as e2:  # noqa: BLE001
                    log(f"{mode} worker retry failed: "
                        f"{type(e2).__name__}: {e2}")
            return None

    # headline: slope between min-window k=8 and k=40 chained ortho passes
    tpu_mcells_s = None
    res = spawn_dl("ortho:8:40", floor=60.0, retry=True)
    if res is not None:
        t8, t40 = res
        t_ortho = max((t40 - t8) / 32.0, 1e-9)
        tpu_mcells_s = mcells / t_ortho
        log(f"TPU backward-grid: {t_ortho * 1e3:.1f} ms/pass "
            f"-> {tpu_mcells_s:.2f} Mcells/s ({NUM_IMAGES} images; "
            f"k8={t8:.2f}s k40={t40:.2f}s)")

    # CPU baseline + agreement (reported as data, never fatal)
    cpu_mcells_s = None
    res = spawn_dl("agree", floor=90.0, retry=True)
    if res is not None:
        t_cpu, agree, dsm_rmse, dsm_max, hit_mm = res
        cpu_mcells_s = mcells / t_cpu
        log(f"CPU baseline (native parFor): {t_cpu:.2f} s "
            f"-> {cpu_mcells_s:.3f} Mcells/s; TPU/CPU agreement {agree:.3f}; "
            f"DSM vs all-neighbors reference at 70 pts/cell: "
            f"rmse {dsm_rmse:.3f} m, max {dsm_max:.3f} m, "
            f"hit mismatch {hit_mm:.4f} (cells 0.5 m)")

    # ---- the ONE machine-readable JSON line, printed FIRST (rows below
    # are stderr-only diagnostics and can be skipped without losing it).
    # vs_baseline is the CANONICAL ratio (idle-host median denominator,
    # BASELINE.md); vs_live_cpu pairs against this run's own CPU pass —
    # expected to wander with host load (VERDICT r3 #5). ----
    vs_live = (
        tpu_mcells_s / cpu_mcells_s
        if (tpu_mcells_s and cpu_mcells_s) else None
    )
    cpu_canonical = (
        mcells / CANONICAL_CPU_ORTHO_S if CANONICAL_CPU_ORTHO_S else None
    )
    vs_canonical = (
        tpu_mcells_s / cpu_canonical
        if (tpu_mcells_s and cpu_canonical) else None
    )
    print(json.dumps({
        "metric": "ortho_backward_grid_throughput",
        "value": round(tpu_mcells_s, 3) if tpu_mcells_s else None,
        "unit": "Mcells/s",
        "vs_baseline": round(vs_canonical, 2) if vs_canonical
        else (round(vs_live, 2) if vs_live else None),
        "vs_live_cpu": round(vs_live, 2) if vs_live else None,
        "cpu_canonical_mcells_s": round(cpu_canonical, 3)
        if cpu_canonical else None,
    }), flush=True)

    # ---- optional rows (stderr), each deadline-gated ----

    # end-to-end frames/s (TPU) + faithful CPU reference pipeline
    t_e2e = None
    res = spawn_dl("e2e:1", floor=300.0, retry=True)
    if res is not None:
        e1, cov_tpu = res
        res5 = spawn_dl("e2e:5", floor=180.0)
        if res5 is not None:
            t_e2e = max((res5[0] - e1) / 4.0, 1e-9)
            n_pairs = -(-NUM_IMAGES // 7) - 1
            log(f"end-to-end (stereo {n_pairs} pairs @ {NUM_DISP} disp + "
                f"DSM + ortho): {t_e2e:.2f} s -> {NUM_IMAGES / t_e2e:.1f} "
                f"frames/s; TPU DSM coverage {cov_tpu:.2f}")
    if t_e2e and CANONICAL_CPU_E2E_S:
        log(f"e2e speedup vs CANONICAL idle-host CPU reference "
            f"({CANONICAL_CPU_E2E_S:.2f} s, BASELINE.md): "
            f"{CANONICAL_CPU_E2E_S / t_e2e:.1f}x")

    # slab-bounded disparity e2e (VERDICT r4 #7): the SAME step with the
    # search window bounded to the prepass-derived terrain slab — the
    # production --disparity_from_slab path (48 vs 80 disparities at this
    # geometry; the incremental driver tracks the slab for free)
    slab_env = {"BENCH_E2E_SLAB_DISP": "1"}
    s1 = spawn_dl("e2e:1", floor=300.0, retry=True, extra_env=slab_env)
    if s1 is not None:
        s5 = spawn_dl("e2e:5", floor=180.0, extra_env=slab_env)
        if s5 is not None:
            t_slab = max((s5[0] - s1[0]) / 4.0, 1e-9)
            speed = (f"; {CANONICAL_CPU_E2E_S / t_slab:.1f}x canonical "
                     f"CPU" if CANONICAL_CPU_E2E_S else "")
            log(f"e2e with slab-bounded disparity search "
                f"(--disparity_from_slab): {t_slab:.2f} s -> "
                f"{NUM_IMAGES / t_slab:.1f} frames/s; DSM coverage "
                f"{s1[1]:.3f}{speed}")
    res = spawn_dl("e2e_cpu", floor=240.0)
    if res is not None:
        tc, tst, tdsm, tor, cov = res
        speedup = f" -> live e2e speedup {tc / t_e2e:.1f}x" if t_e2e else ""
        log(f"CPU reference e2e (cv2.StereoBM + native parFor, live run): "
            f"{tc:.2f} s (stereo {tst:.2f} dsm {tdsm:.2f} ortho "
            f"{tor:.2f}; DSM coverage {cov:.2f}){speedup}")

    # full incremental driver (host loop included, VERDICT r2 #8) — runs
    # before the per-update latency pair: it is the headline incremental
    # row and completes in ~90 s when the tunnel is healthy
    # no retry -> the single attempt gets the whole remaining window (the
    # halved first-attempt cap starved this worker's warm-up once)
    res = spawn_dl("inc_full", floor=240.0)
    if res is not None:
        t_full, n_upd, t_pre = res[:3]
        t_min, t_max = (res[3], res[4]) if len(res) >= 5 else (t_full,
                                                               t_full)
        log(f"incremental driver, full {NUM_IMAGES}-image sequence: "
            f"streaming (per-frame h2d) MEDIAN of 3 passes {t_full:.2f} s "
            f"(range {t_min:.2f}-{t_max:.2f}) for {int(n_upd)} "
            f"updates -> {n_upd / t_full:.2f} updates/s "
            f"({NUM_IMAGES / t_full:.1f} frames/s, range "
            f"{NUM_IMAGES / t_max:.1f}-{NUM_IMAGES / t_min:.1f}); "
            f"prestaged (one bulk "
            f"h2d) {t_pre:.2f} s -> {n_upd / t_pre:.2f} updates/s "
            f"({NUM_IMAGES / t_pre:.1f} frames/s)")

    # incremental "mapping on the fly" per-update latency (VERDICT r1 #6)
    i1 = spawn_dl("inc:1", floor=240.0, retry=True)
    i5 = spawn_dl("inc:5", floor=150.0) if i1 is not None else None
    if i1 is not None and i5 is not None:
        t_inc = max((i5[0] - i1[0]) / 4.0, 1e-9)
        log(f"incremental update (1 pair @ {NUM_DISP} disp + DSM delta + "
            f"7-image ortho subset): {t_inc * 1e3:.1f} ms/update")

    # bundle adjustment timing row (north-star extension; VERDICT r1 #10)
    b1 = spawn_dl("ba:1", floor=240.0, retry=True)
    b3 = spawn_dl("ba:3", floor=150.0) if b1 is not None else None
    if b1 is not None and b3 is not None:
        t_ba = max((b3[0] - b1[0]) / 2.0, 1e-9)
        log(f"bundle adjustment (249 cams, ~140k obs, 10 LM iters): "
            f"{t_ba:.2f} s/solve")
    log(f"bench done in {time.monotonic() - t_main0:.0f}s "
        f"(budget {deadline_s:.0f}s)")


if __name__ == "__main__":
    main()
