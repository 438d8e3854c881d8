#!/usr/bin/env python
"""Benchmark: backward-grid orthomosaic throughput (Mcells/s) per chip.

Headline metric (BASELINE.json): the backward-grid ortho kernel — the
reference system's dominant cost (O(cells x images) loops,
ortho-backward-grid.cc:56-121) — on a cadastre-scale workload:
249 images at 752x480, a 400x400-cell map at 0.5 m. The denominator is the
measured native C++ baseline (native/reference_baseline.cc): the same loops
with the reference's std::thread parFor parallelism on all host cores —
the reference repo itself publishes no numbers (BASELINE.md).

Also measured and reported on stderr: end-to-end pipeline (virtual stereo
every 7th frame, as the reference's dense demo flagfile does -> DSM -> ortho)
in frames/s, and the DSM IDW kernel vs its native baseline.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

import numpy as np

NUM_IMAGES = int(os.environ.get("BENCH_NUM_IMAGES", "249"))
IMG_W = int(os.environ.get("BENCH_IMG_W", "752"))
IMG_H = int(os.environ.get("BENCH_IMG_H", "480"))
MAP_CELLS = int(os.environ.get("BENCH_MAP_CELLS", "400"))  # per side
RESOLUTION = 0.5
REPS = int(os.environ.get("BENCH_REPS", "3"))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from aerial_mapper_tpu.camera.models import Camera
    from aerial_mapper_tpu.config import (
        BlockMatchingConfig,
        DsmConfig,
        OrthoBackwardGridConfig,
    )
    from aerial_mapper_tpu.dsm.idw import idw_to_grid
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat
    from aerial_mapper_tpu.mapgrid.grid import (
        MapGeometry,
        cell_centers,
        create_map_state,
    )
    from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update
    from aerial_mapper_tpu.stereo.batched import (
        prepare_pair_operands,
        process_pairs_batched,
    )
    from aerial_mapper_tpu.synth.scene import (
        SyntheticScene,
        make_survey_poses,
        render_image,
    )

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    # ---- workload: cadastre-scale synthetic survey --------------------
    cam = Camera(fx=480.0, fy=480.0, cx=IMG_W / 2.0, cy=IMG_H / 2.0,
                 width=IMG_W, height=IMG_H)
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=6.0)
    # two flight lines spanning the 200 m x 200 m map
    Rs, ts = make_survey_poses(
        NUM_IMAGES, altitude=514.0, spacing=200.0 / max(NUM_IMAGES // 2, 1),
        num_lines=2, line_spacing=60.0, start_easting=-100.0,
        start_northing=-30.0,
    )
    t_render0 = time.perf_counter()
    images = jnp.stack(
        [
            render_image(scene, cam, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    images.block_until_ready()
    log(f"rendered {NUM_IMAGES} images {IMG_W}x{IMG_H} in "
        f"{time.perf_counter() - t_render0:.1f}s")

    geom = MapGeometry(center_easting=0.0, center_northing=0.0,
                       resolution=RESOLUTION, height=MAP_CELLS,
                       width=MAP_CELLS)
    ce, cn = cell_centers(geom)
    elevation = scene.height(ce, cn)
    layers = dict(create_map_state(geom).layers)
    layers["elevation"] = elevation

    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)),
                        jnp.float32)
    ts_j = jnp.asarray(ts, jnp.float32)
    ortho_cfg = OrthoBackwardGridConfig(cell_chunk=20000)

    # ---- TPU: backward-grid ortho (headline) --------------------------
    def run_ortho():
        return backward_grid_update(
            layers, quats, ts_j, images, geom, cam, ortho_cfg
        )

    out = run_ortho()
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run_ortho()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t_tpu = float(np.median(times))
    mcells = MAP_CELLS * MAP_CELLS / 1e6
    tpu_mcells_s = mcells / t_tpu
    log(f"TPU backward-grid: {t_tpu * 1e3:.1f} ms "
        f"-> {tpu_mcells_s:.2f} Mcells/s ({NUM_IMAGES} images)")

    # ---- CPU native baseline (reference loops + parFor) ---------------
    cpu_mcells_s = None
    try:
        from aerial_mapper_tpu.io.poses import _rot_matrix_np
        from aerial_mapper_tpu.native import backward_grid_cpu

        cells_np = np.stack(
            [np.asarray(ce, np.float64).ravel(),
             np.asarray(cn, np.float64).ravel(),
             np.asarray(elevation, np.float64).ravel()], axis=1,
        )
        R_cw = np.transpose(Rs, (0, 2, 1))  # world->camera
        images_np = np.asarray(images, np.float32)
        t0 = time.perf_counter()
        o_cpu, a_cpu, _ = backward_grid_cpu(
            cells_np, R_cw, ts, images_np, cam.fx, cam.fy, cam.cx, cam.cy,
        )
        t_cpu = time.perf_counter() - t0
        cpu_mcells_s = mcells / t_cpu
        log(f"CPU baseline (native parFor, all cores): {t_cpu:.2f} s "
            f"-> {cpu_mcells_s:.3f} Mcells/s")
        # sanity: outputs agree where both textured
        ortho_tpu = np.asarray(out["ortho"]).ravel()
        both = (a_cpu > 0) & np.isfinite(ortho_tpu)
        agree = np.mean(
            np.abs(ortho_tpu[both] - o_cpu[both]) < 2.0
        ) if both.any() else 0.0
        log(f"TPU/CPU ortho agreement (<2 gray levels): {agree:.3f}")
    except Exception as e:  # noqa: BLE001
        log(f"CPU baseline unavailable: {type(e).__name__}: {e}")

    # ---- secondary: end-to-end (stereo every 7th -> DSM -> ortho) -----
    try:
        bm_cfg = BlockMatchingConfig(num_disparities=64)
        dsm_cfg = DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8)
        ops = prepare_pair_operands(cam.K, Rs, ts, images, use_every_nth=7)

        def end_to_end(ops_a, layers_a, quats_a, ts_a, images_a):
            pts, intens, valid = process_pairs_batched(
                ops_a, cam, matcher="bm", bm_cfg=bm_cfg, batch_chunk=1
            )
            p = pts.reshape(-1, 3)
            v = valid.reshape(-1)
            values, hit = idw_to_grid(
                p[:, :2], p[:, 2], v, geom, dsm_cfg.bin_capacity,
                radius_sq=dsm_cfg.interpolation_radius_sq,
                adaptive=True, growth=1.1, max_radius_sq=7.0,
            )
            li = dict(layers_a)
            li["elevation"] = jnp.where(hit, values,
                                        jnp.full_like(values, jnp.nan))
            return backward_grid_update(
                li, quats_a, ts_a, images_a, geom, cam, ortho_cfg
            )

        e2e = jax.jit(end_to_end)
        jax.block_until_ready(e2e(ops, layers, quats, ts_j, images))
        t0 = time.perf_counter()
        out2 = e2e(ops, layers, quats, ts_j, images)
        jax.block_until_ready(out2)
        t_e2e = time.perf_counter() - t0
        log(f"end-to-end (stereo x{ops.image1.shape[0]} pairs + DSM + "
            f"ortho): {t_e2e:.2f} s -> {NUM_IMAGES / t_e2e:.1f} frames/s")
    except Exception as e:  # noqa: BLE001
        log(f"end-to-end bench failed: {type(e).__name__}: {e}")

    vs_baseline = (
        tpu_mcells_s / cpu_mcells_s if cpu_mcells_s else None
    )
    print(json.dumps({
        "metric": "ortho_backward_grid_throughput",
        "value": round(tpu_mcells_s, 3),
        "unit": "Mcells/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
