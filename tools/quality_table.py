#!/usr/bin/env python
"""Densifier quality table at bench scale (docs/PERFORMANCE.md).

Runs the configured matcher over the bench workload (249 images at
752x480, 35 pairs, 400x400-cell map at 0.5 m — bench.py's
``_build_workload``), rasterizes the DSM, and reports coverage + error
vs the synthetic scene's analytic height — the harness behind the
"Densifier quality at the full bench scale" table and the round-5 SGM
penalty investigation (VERDICT r4 #3: try the cv-convention
block-scaled P1/P2 against the reference's flat 120/250,
/root/reference/aerial_mapper_dense_pcl/include/aerial-mapper-dense-pcl/
common.h:85-96).

Usage:
  python tools/quality_table.py bm
  python tools/quality_table.py sgm --p1 120 --p2 250
  python tools/quality_table.py sgm --p1 648 --p2 2592 --z-filter
  python tools/quality_table.py bm --min-disp 48 --num-disp 32

Each run prints one row: config, stereo seconds (k-differenced min
windows when --time, else one timed pass), coverage, RMSE, median and
p95 abs error (whole map and z-filtered +-40 m envelope).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("matcher", choices=["bm", "sgm"])
    ap.add_argument("--p1", type=float, default=None)
    ap.add_argument("--p2", type=float, default=None)
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--num-disp", type=int, default=80)
    ap.add_argument("--min-disp", type=int, default=None)
    ap.add_argument("--uniqueness", type=int, default=None)
    ap.add_argument("--texture", type=float, default=None,
                    help="SGM-only BM-style texture gate "
                         "(SgmConfig.texture_threshold)")
    ap.add_argument("--z-filter", action="store_true",
                    help="apply the +-40 m survey envelope "
                         "(--stereo_z_min/max 374/454) before the DSM")
    ap.add_argument("--time", action="store_true",
                    help="k-differenced min-window stereo timing "
                         "(2 and 6 chained calls)")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax
    import jax.numpy as jnp

    import bench
    from aerial_mapper_tpu.config import (
        BlockMatchingConfig,
        DsmConfig,
        SgmConfig,
    )
    from aerial_mapper_tpu.dsm.idw import idw_to_grid
    from aerial_mapper_tpu.stereo.batched import (
        filter_points_z,
        prepare_pair_operands,
        process_pairs_batched,
    )

    (cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, quats,
     ts_j) = bench._build_workload()
    images = images.astype(jnp.float32)
    ops = prepare_pair_operands(cam.K, Rs, ts, images, use_every_nth=7,
                                phase=0)

    kw = {}
    if args.block is not None:
        kw["block_size"] = args.block
    if args.min_disp is not None:
        kw["min_disparity"] = args.min_disp
    if args.uniqueness is not None:
        kw["uniqueness_ratio"] = args.uniqueness
    bm_cfg = BlockMatchingConfig(num_disparities=args.num_disp, **kw)
    skw = dict(kw)
    if args.texture is not None:
        skw["texture_threshold"] = args.texture
    if args.p1 is not None:
        skw["p1"] = args.p1
    if args.p2 is not None:
        skw["p2"] = args.p2
    sgm_cfg = SgmConfig(num_disparities=args.num_disp, **skw)
    dsm_cfg = DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8)

    # ops rides as an OPERAND: closing over the ~100 MB image stacks
    # would bake them into the HLO as constants, which the axon remote
    # compiler rejects around ~300 MB (CLAUDE.md; bench worker_e2e uses
    # the same form)
    @jax.jit
    def stereo_step(eps, ops):
        o = ops._replace(T1_inv=ops.T1_inv + eps * 1e-30)
        pts, _i, valid = process_pairs_batched(
            o, cam, matcher=args.matcher, bm_cfg=bm_cfg, sgm_cfg=sgm_cfg,
            batch_chunk=1)
        return pts, valid

    pts, valid = stereo_step(jnp.float32(0), ops)  # compile + run
    dt = None
    if args.time:
        def step(eps):
            p, v = stereo_step(eps, ops)
            return jnp.sum(p) * 1e-12

        dt2 = bench._min_window(step, jnp.float32(0), 2, reps=3,
                                readback=float)
        dt6 = bench._min_window(step, jnp.float32(0), 6, reps=3,
                                readback=float)
        dt = max((dt6 - dt2) / 4.0, 1e-9)

    p = pts.reshape(-1, 3)
    truth = np.asarray(scene.height(ce, cn))

    def metrics(v):
        vals, hit = idw_to_grid(
            p[:, :2], p[:, 2], v, geom, dsm_cfg.bin_capacity,
            radius_sq=dsm_cfg.interpolation_radius_sq, adaptive=True,
            growth=1.1, max_radius_sq=7.0,
        )
        elev = np.where(np.asarray(hit), np.asarray(vals), np.nan)
        fin = np.isfinite(elev)
        err = np.abs(elev[fin] - truth[fin])
        return {
            "valid_points": int(np.asarray(v).sum()),
            "coverage": round(float(fin.mean()), 3),
            "rmse_m": round(float(np.sqrt((err ** 2).mean())), 3),
            "median_m": round(float(np.median(err)), 3),
            "p95_m": round(float(np.percentile(err, 95)), 3),
        }

    v = valid.reshape(-1)
    row = {
        "matcher": args.matcher,
        "p1": getattr(sgm_cfg, "p1", None) if args.matcher == "sgm"
        else None,
        "p2": getattr(sgm_cfg, "p2", None) if args.matcher == "sgm"
        else None,
        "num_disp": args.num_disp,
        "min_disp": kw.get("min_disparity", 1),
        "raw": metrics(v),
        "z_filtered": metrics(filter_points_z(p, v, 374.0, 454.0)),
    }
    if dt is not None:
        row["stereo_s"] = round(dt, 3)
        row["ms_per_pair"] = round(dt / ops.baseline.shape[0] * 1e3, 2)
    print(row, flush=True)


if __name__ == "__main__":
    main()
