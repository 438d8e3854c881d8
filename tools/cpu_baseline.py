#!/usr/bin/env python
"""Canonical idle-host CPU baseline measurement (VERDICT r3 #5).

The live per-bench CPU denominator swings >2x with host load (0.13-0.70
Mcells/s across rounds for the identical native binary), which made the
headline `vs_baseline` ratio noise. This tool measures the denominators
PROPERLY, once: median of N runs on an idle host, with host-state
provenance, for

  1. the native C++ parFor backward-grid ortho pass (the bench headline
     denominator, native/reference_baseline.cc), and
  2. the faithful CPU reference end-to-end pipeline (cv2.StereoBM +
     native parFor loops, testing/cpu_pipeline.py).

Record the output in BASELINE.md and bench.py's CANONICAL_* constants.
Refuses to certify a run when the pre-existing host load is non-idle.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/cpu_baseline.py
"""

import json
import os
import platform
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    load1 = os.getloadavg()[0]
    ncpu = os.cpu_count()
    idle = load1 < 0.2 * ncpu
    print(f"host: {ncpu} cores, loadavg(1m) {load1:.2f} "
          f"({'IDLE' if idle else 'BUSY — numbers not canonical'}), "
          f"{platform.platform()}", file=sys.stderr)

    import bench
    from aerial_mapper_tpu.native import backward_grid_cpu
    from aerial_mapper_tpu.testing.cpu_pipeline import (
        run_reference_pipeline_cpu,
    )

    (cam, scene, Rs, ts, images, geom, ce, cn, elevation, layers, quats,
     ts_j) = bench._build_workload()
    mcells = geom.height * geom.width / 1e6
    cells_np = np.stack(
        [np.asarray(ce, np.float64).ravel(),
         np.asarray(cn, np.float64).ravel(),
         np.asarray(elevation, np.float64).ravel()], axis=1,
    )
    R_cw = np.transpose(np.asarray(Rs), (0, 2, 1))
    images_np = np.asarray(images, np.float32)

    n_ortho = int(os.environ.get("CPU_BASELINE_ORTHO_RUNS", "7"))
    ortho_times = []
    for i in range(n_ortho):
        t0 = time.perf_counter()
        backward_grid_cpu(cells_np, R_cw, np.asarray(ts), images_np,
                          cam.fx, cam.fy, cam.cx, cam.cy)
        dt = time.perf_counter() - t0
        ortho_times.append(dt)
        print(f"ortho run {i}: {dt:.3f} s ({mcells / dt:.3f} Mcells/s)",
              file=sys.stderr)
    t_ortho = statistics.median(ortho_times)

    n_e2e = int(os.environ.get("CPU_BASELINE_E2E_RUNS", "3"))
    e2e_times = []
    for i in range(n_e2e):
        t0 = time.perf_counter()
        run_reference_pipeline_cpu(
            cam.K, np.asarray(Rs, np.float64), np.asarray(ts, np.float64),
            images_np, geom, use_every_nth=7,
            num_disparities=bench.NUM_DISP,
        )
        dt = time.perf_counter() - t0
        e2e_times.append(dt)
        print(f"e2e run {i}: {dt:.2f} s", file=sys.stderr)
    t_e2e = statistics.median(e2e_times)

    print(json.dumps({
        "canonical_cpu_ortho_s": round(t_ortho, 4),
        "canonical_cpu_ortho_mcells_s": round(mcells / t_ortho, 4),
        "ortho_runs_s": [round(t, 4) for t in ortho_times],
        "canonical_cpu_e2e_s": round(t_e2e, 3),
        "e2e_runs_s": [round(t, 3) for t in e2e_times],
        "host_cores": ncpu,
        "loadavg_1m_at_start": round(load1, 3),
        "idle": idle,
        "num_images": bench.NUM_IMAGES,
        "num_disparities": bench.NUM_DISP,
        "map_cells": bench.MAP_CELLS,
        "date": time.strftime("%Y-%m-%d"),
    }, indent=1))


if __name__ == "__main__":
    main()
