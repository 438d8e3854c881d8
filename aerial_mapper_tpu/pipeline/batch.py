"""Batch pipeline drivers — one per reference demo executable.

Each function replays one of the reference mains end-to-end
(SURVEY.md §3 call stacks) on the TPU path and returns/persists typed
artifacts:

- ``run_dense_pcl``       <- aerial_mapper_demos_dense_pcl (main-dense-pcl.cc)
- ``run_dsm``             <- aerial_mapper_demos_dsm (main-dsm.cc)
- ``run_ortho_backward_grid`` <- ..._ortho_backward_grid (batch mode)
- ``run_ortho_forward_homography`` <- ..._ortho_forward_homography
- ``run_ortho_from_pcl``  <- ..._ortho_from_pcl
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.config import PipelineConfig
from aerial_mapper_tpu.dsm.idw import ortho_from_points, update_elevation_layer
from aerial_mapper_tpu.io.artifacts import save_layers, save_points
from aerial_mapper_tpu.io.geotiff import write_geotiff
from aerial_mapper_tpu.io.images import save_image
from aerial_mapper_tpu.io.pointcloud import save_point_cloud_txt
from aerial_mapper_tpu.mapgrid.grid import MapGeometry, create_map_state
from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update
from aerial_mapper_tpu.ortho.homography import (
    auto_window as _homography_auto_window,
    homography_mosaic_batch,
)
from aerial_mapper_tpu.pipeline.dataset import Dataset
from aerial_mapper_tpu.utils.timing import StageTimer

logger = logging.getLogger("aerial_mapper_tpu")


def _stereo_cloud(dataset: Dataset, cfg: PipelineConfig, timer: StageTimer):
    """Shared stereo front-end: images + poses -> stacked point buffers.

    Uses the batched pair path (stereo/batched.py): the whole subsampled
    sequence is one chunked device program instead of the reference's
    serial per-pair loop (stereo.cpp:91-110).
    """
    from aerial_mapper_tpu.io.poses import _rot_matrix_np
    from aerial_mapper_tpu.stereo.batched import (
        prepare_pair_operands,
        process_pairs_batched,
    )

    quats_c, trans_c = dataset.camera_poses()
    Rs = np.stack([_rot_matrix_np(q) for q in quats_c])
    images = [jnp.asarray(im, jnp.float32) for im in dataset.images]
    if images[0].ndim == 3:
        # matching runs on grayscale (stereo.cpp:117-125)
        from aerial_mapper_tpu.image.color import rgb_to_gray

        images = [rgb_to_gray(im) for im in images]
    if cfg.stereo.images_need_undistortion:
        from aerial_mapper_tpu.camera.undistort import undistort_image

        images = [undistort_image(dataset.rig.camera, im) for im in images]
    if cfg.stereo.densifier == "plane_sweep":
        # multi-view plane-sweep densifier (opt-in quality mode; extends
        # the reference's consecutive-pair stereo to N-view fusion);
        # reference views are data-parallel over the mesh when available
        import jax as _jax

        ps_cam = dataset.rig.camera
        if cfg.stereo.images_need_undistortion and \
                ps_cam.dist_kind != "none":
            # the images were ALREADY undistorted above: sweep with the
            # pinhole model, or rays get undistorted twice and neighbor
            # samples land at distorted positions in undistorted images
            ps_cam = ps_cam._replace(dist_kind="none",
                                     dist_params=(0.0, 0.0, 0.0, 0.0))
        from aerial_mapper_tpu.stereo.plane_sweep import (
            resolve_z_range,
            warn_boundary_pileup,
        )

        # unset --ps_z_min/--ps_z_max: derive the sweep range from a BM
        # prepass so the planes bracket the actual terrain (VERDICT r4 #4)
        ps_cfg = resolve_z_range(
            cfg.plane_sweep, images, Rs, trans_c, ps_cam, bm_cfg=cfg.bm,
            use_every_nth=cfg.stereo.use_every_nth_image,
        )
        devices = _jax.devices()
        if cfg.auto_shard and len(devices) > 1:
            from aerial_mapper_tpu.parallel.mesh import make_mesh
            from aerial_mapper_tpu.parallel.sharded import (
                sharded_plane_sweep,
            )
            from aerial_mapper_tpu.stereo.plane_sweep import (
                prepare_plane_sweep_operands,
            )

            ps_ops = prepare_plane_sweep_operands(
                images, Rs, trans_c, cfg=ps_cfg,
                use_every_nth=cfg.stereo.use_every_nth_image,
                pad_to_multiple=len(devices),
            )
            mesh = make_mesh(("tiles",), shape=(len(devices),),
                             devices=devices)
            with timer.stage("dense_pcl", work_items=len(images)):
                points, intens, valid = sharded_plane_sweep(
                    ps_ops, ps_cam, ps_cfg, mesh,
                )
            logger.info(
                "dense_pcl: %d plane-sweep reference views sharded over "
                "%d devices", int(np.asarray(ps_ops.ref_valid).sum()),
                len(devices),
            )
        else:
            from aerial_mapper_tpu.stereo.plane_sweep import (
                process_sequence_plane_sweep,
            )

            with timer.stage("dense_pcl", work_items=len(images)):
                points, intens, valid = process_sequence_plane_sweep(
                    images, Rs, trans_c, ps_cam,
                    cfg=ps_cfg,
                    use_every_nth=cfg.stereo.use_every_nth_image,
                )
        warn_boundary_pileup(points, valid, ps_cfg)
        return points.reshape(-1, 3), intens.reshape(-1), valid.reshape(-1)
    import jax

    bm_cfg, sgm_cfg = cfg.bm, cfg.sgm
    if cfg.stereo.disparity_from_slab:
        # slab-bounded disparity search (opt-in approximation): bound the
        # window to the disparities the terrain slab can produce — the
        # matcher scales ~linearly with the disparity count
        import dataclasses as _dc

        from aerial_mapper_tpu.stereo.batched import (
            disparity_range_from_slab,
        )

        try:
            if cfg.stereo.z_min is not None and \
                    cfg.stereo.z_max is not None:
                z_lo, z_hi = cfg.stereo.z_min, cfg.stereo.z_max
            else:
                from aerial_mapper_tpu.stereo.plane_sweep import (
                    auto_z_range,
                )

                z_lo, z_hi = auto_z_range(images, Rs, trans_c,
                                          dataset.rig.camera,
                                          bm_cfg=cfg.bm)
            lo, num = disparity_range_from_slab(
                dataset.rig.camera.K, Rs, trans_c,
                (images[0].shape[-2], images[0].shape[-1]), z_lo, z_hi,
                use_every_nth=cfg.stereo.use_every_nth_image,
            )
        except ValueError as e:
            # degenerate slab/geometry: an opt-in optimization must not
            # abort the run — fall back to the full search range
            logger.warning(
                "disparity_from_slab: %s — falling back to the full "
                "%d-disparity search", e, cfg.bm.num_disparities,
            )
        else:
            bm_cfg = _dc.replace(bm_cfg, min_disparity=lo,
                                 num_disparities=num)
            sgm_cfg = _dc.replace(sgm_cfg, min_disparity=max(lo, 1),
                                  num_disparities=num)
            logger.info(
                "slab-bounded disparity search: slab [%.1f, %.1f] m -> "
                "disparities [%d, %d) (%d vs %d full)",
                z_lo, z_hi, lo, lo + num, num, cfg.bm.num_disparities,
            )

    devices = jax.devices()
    if cfg.auto_shard and len(devices) > 1:
        # pair-data-parallel stereo: ring frames sharded over every
        # device, padded to the device count (stereo is the heaviest e2e
        # stage — SURVEY.md §3.1; per-pair outputs are bit-identical to
        # the sequential batched path, tests/test_parallel.py)
        from aerial_mapper_tpu.parallel.mesh import make_mesh
        from aerial_mapper_tpu.parallel.sharded import (
            pad_ring_pairs,
            prepare_ring_pair_operands,
            sharded_process_pairs,
        )

        ring = prepare_ring_pair_operands(
            dataset.rig.camera.K, Rs, trans_c, images,
            use_every_nth=cfg.stereo.use_every_nth_image,
        )
        b_real = ring.frames.shape[0]
        ring = pad_ring_pairs(ring, len(devices))
        mesh = make_mesh(("tiles",), shape=(len(devices),),
                         devices=devices)
        with timer.stage("dense_pcl", work_items=len(images)):
            points, intens, valid = sharded_process_pairs(
                ring, dataset.rig.camera, mesh,
                matcher=cfg.stereo.matcher, bm_cfg=bm_cfg, sgm_cfg=sgm_cfg,
            )
        logger.info("dense_pcl: %d pairs sharded over %d devices",
                    b_real, len(devices))
        points, intens, valid = (
            points[:b_real], intens[:b_real], valid[:b_real]
        )
    else:
        ops = prepare_pair_operands(
            dataset.rig.camera.K, Rs, trans_c, images,
            use_every_nth=cfg.stereo.use_every_nth_image,
        )
        with timer.stage("dense_pcl", work_items=len(images)):
            points, intens, valid = process_pairs_batched(
                ops, dataset.rig.camera, matcher=cfg.stereo.matcher,
                bm_cfg=bm_cfg, sgm_cfg=sgm_cfg, batch_chunk=1,
            )
    from aerial_mapper_tpu.stereo.batched import filter_points_z

    valid = filter_points_z(points, valid, cfg.stereo.z_min,
                            cfg.stereo.z_max)
    return (
        points.reshape(-1, 3),
        intens.reshape(-1),
        valid.reshape(-1),
    )


def run_dense_pcl(
    dataset: Dataset,
    cfg: PipelineConfig = PipelineConfig(),
    output_cloud_txt: Optional[str] = None,
    output_cloud_npz: Optional[str] = None,
    datasets=None,
):
    """Dense reconstruction demo (main-dense-pcl.cc:35-75). ``datasets``
    (optional per-camera list) merges every rig camera's stream."""
    timer = StageTimer()
    if datasets is not None and len(datasets) > 1:
        points, intens, valid = multicam_cloud(datasets, cfg, timer)
    else:
        points, intens, valid = _stereo_cloud(dataset, cfg, timer)
    logger.info("dense_pcl: %d valid points", int(np.asarray(valid).sum()))
    if output_cloud_npz:
        save_points(output_cloud_npz, points, intens, valid)
    if output_cloud_txt:
        v = np.asarray(valid)
        save_point_cloud_txt(
            output_cloud_txt, np.asarray(points)[v], np.asarray(intens)[v]
        )
    logger.info(timer.report())
    return points, intens, valid


def _auto_mesh(geom: MapGeometry, cfg: PipelineConfig):
    """Row-band ``tiles`` mesh over ALL local devices, or None on one
    device. Map heights that don't divide are handled by the drivers via
    ``pad_map_geometry`` (south padding, cropped from every output)."""
    del geom
    if not cfg.auto_shard:
        return None
    import jax

    devices = jax.devices()
    if len(devices) <= 1:
        return None
    from aerial_mapper_tpu.parallel.mesh import make_mesh

    return make_mesh(("tiles",), shape=(len(devices),), devices=devices)


def _pad_layers(layers: dict, geom: MapGeometry,
                geom_pad: MapGeometry) -> dict:
    """Append init-valued southern rows so an [H, W] layer dict fits the
    padded band-sharded geometry (values for the original rows are
    untouched; pad-row results are cropped before anything consumes them).
    """
    if geom_pad.height == geom.height:
        return layers
    init = create_map_state(geom_pad).layers
    pad_rows = geom_pad.height - geom.height
    return {
        k: jnp.concatenate([v, init[k][-pad_rows:]], axis=0)
        for k, v in layers.items()
    }


def _crop_layers(layers: dict, geom: MapGeometry) -> dict:
    return {k: v[: geom.height] for k, v in layers.items()}


def _resolve_cloud(dataset, cfg, timer, point_cloud=None, datasets=None):
    if point_cloud is not None:
        points, intens = point_cloud
        points = jnp.asarray(points, jnp.float32)
        intens = jnp.asarray(intens, jnp.float32)
        valid = jnp.ones(points.shape[0], bool)
        return points, intens, valid
    if datasets is not None and len(datasets) > 1:
        return multicam_cloud(datasets, cfg, timer)
    return _stereo_cloud(dataset, cfg, timer)


def multicam_cloud(datasets, cfg: PipelineConfig, timer: StageTimer):
    """Merged dense cloud from every rig camera's image stream.

    Each per-camera Dataset (``load_multicam_datasets``) runs the standard
    virtual-stereo front-end against its OWN stream and camera-j poses
    (T_G_Cj = T_G_B * T_B_Cj via the promoted rig slot); the world-frame
    point buffers concatenate into one cloud for the DSM/ortho stages.
    The reference cannot do this at all — its pipelines hardcode camera 0
    of the loaded ncamera rig (stereo.cpp:37-40) — so multi-camera fusion
    is a pure framework extension with no parity quirk to preserve.
    """
    parts = [_stereo_cloud(ds, cfg, timer) for ds in datasets]
    points = jnp.concatenate([p for p, _, _ in parts], axis=0)
    intens = jnp.concatenate([i for _, i, _ in parts], axis=0)
    valid = jnp.concatenate([v for _, _, v in parts], axis=0)
    logger.info(
        "multicam: merged %d camera streams -> %d points (%s valid)",
        len(parts), points.shape[0],
        "/".join(str(int(np.asarray(v).sum())) for _, _, v in parts),
    )
    return points, intens, valid


def run_dsm(
    dataset: Dataset,
    cfg: PipelineConfig = PipelineConfig(),
    point_cloud: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    output_geotiff: Optional[str] = None,
    output_layers_npz: Optional[str] = None,
    output_report_html: Optional[str] = None,
    utm_zone: int = 32,
    datasets=None,
):
    """DSM demo (main-dsm.cc:46-111): cloud (given or generated) -> elevation
    layer -> float32 GeoTiff. ``datasets`` (optional list of per-camera
    Datasets from ``load_multicam_datasets``) fuses every rig camera's
    stream into the cloud."""
    from aerial_mapper_tpu.utils.timing import log_config

    log_config("DSM", cfg.dsm)
    timer = StageTimer()
    geom = MapGeometry.from_config(cfg.grid)
    points, intens, valid = _resolve_cloud(dataset, cfg, timer, point_cloud,
                                           datasets)

    layers = dict(create_map_state(geom).layers)
    mesh = _auto_mesh(geom, cfg)
    with timer.stage("dsm", work_items=geom.height * geom.width / 1e6):
        if mesh is not None:
            from aerial_mapper_tpu.parallel.sharded import (
                pad_map_geometry,
                shard_layers,
                sharded_dsm_update,
            )

            geom_pad, _ = pad_map_geometry(geom, mesh.shape["tiles"])
            layers = shard_layers(
                _pad_layers(layers, geom, geom_pad), mesh, "tiles"
            )
            layers["elevation"] = sharded_dsm_update(
                layers["elevation"], points, valid, geom_pad, cfg.dsm, mesh
            )
            layers = _crop_layers(layers, geom)
            logger.info("dsm: row-band sharded over %d devices",
                        mesh.shape["tiles"])
        else:
            layers = update_elevation_layer(
                layers, points, valid, geom, cfg.dsm
            )
    if output_layers_npz:
        save_layers(output_layers_npz,
                    {k: np.asarray(v) for k, v in layers.items()}, geom)
    if output_geotiff:
        write_geotiff(
            output_geotiff, np.asarray(layers["elevation"], np.float32),
            west=geom.west, north=geom.north, resolution=geom.resolution,
            utm_zone=utm_zone,
        )
    if output_report_html:
        from aerial_mapper_tpu.io.report import write_html_report
        from aerial_mapper_tpu.utils.timing import config_banner

        write_html_report(
            output_report_html, layers, geom, title="DSM run",
            config_banner=config_banner("DSM", cfg.dsm),
            timings=timer.durations,
        )
    logger.info(timer.report())
    return layers, geom


def run_ortho_backward_grid(
    dataset: Dataset,
    cfg: PipelineConfig = PipelineConfig(),
    point_cloud: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    output_geotiff: Optional[str] = None,
    output_jpg: Optional[str] = None,
    output_layers_npz: Optional[str] = None,
    output_report_html: Optional[str] = None,
    utm_zone: int = 32,
    datasets=None,
):
    """Batch backward-grid demo (main-ortho-backward-grid.cc:66-145):
    DSM first, then best-angle ortho texturing against all images.

    ``datasets`` (optional list of per-camera Datasets): fuse every rig
    camera's stream — merged cloud for the DSM, then one best-angle
    texturing pass per stream over the same layers. The per-cell update
    only replaces on a STRICTLY more-nadir observation (the incremental
    contract, ortho-backward-grid.cc:90), so the passes compose exactly
    like the reference's incremental batches; exact cross-camera angle
    ties keep the earlier camera (operand order within one stream). The
    ``observation_index`` layer uses global ids: stream j's image i maps
    to ``sum(len(earlier streams)) + i``.
    """
    from aerial_mapper_tpu.utils.timing import log_config

    log_config("Orthomosaic (backward grid)", cfg.ortho_backward)
    timer = StageTimer()
    layers, geom = run_dsm(dataset, cfg, point_cloud=point_cloud,
                           datasets=datasets)

    streams = list(datasets) if datasets else [dataset]
    mesh = _auto_mesh(geom, cfg)
    with timer.stage(
        "ortho_backward", work_items=geom.height * geom.width / 1e6
    ):
        if mesh is not None:
            from aerial_mapper_tpu.parallel.sharded import (
                band_image_operands,
                pad_map_geometry,
                shard_layers,
                sharded_backward_grid_update_banded,
            )

            # exact cull slab from the ACTUAL post-DSM elevation range
            # (one host readback; the DSM stage above already materialized
            # the layer), so per-band image subsets are provably
            # conservative — no slab assumption to violate
            elev_np = np.asarray(layers["elevation"])
            finite = np.isfinite(elev_np)
            if cfg.ortho_backward.use_digital_elevation_map and finite.any():
                elev_lo = float(elev_np[finite].min()) - 1e-3
                elev_hi = float(elev_np[finite].max()) + 1e-3
            else:
                e0 = cfg.ortho_backward.orthomosaic_elevation_m
                elev_lo, elev_hi = e0 - 1e-3, e0 + 1e-3
            n_tiles = mesh.shape["tiles"]
            geom_pad, _ = pad_map_geometry(geom, n_tiles)
            layers = shard_layers(
                _pad_layers(layers, geom, geom_pad), mesh, "tiles"
            )
            id_offset = 0
            for ds in streams:
                quats_c, trans_c = ds.camera_poses()
                # HOST image copies for the cull: band_image_operands
                # rebuilds the per-band layouts on the host, and feeding it
                # the device stack would read the whole [N, H, W] back over
                # the tunnel
                host_images = np.stack(
                    [np.asarray(im, np.float32) for im in ds.images]
                )
                banded = band_image_operands(
                    geom_pad, n_tiles, np.asarray(quats_c),
                    np.asarray(trans_c), host_images, ds.rig.camera,
                    elev_min=elev_lo, elev_max=elev_hi,
                )
                if id_offset:
                    banded = banded._replace(ids=jnp.where(
                        banded.ids >= 0, banded.ids + id_offset, banded.ids
                    ))
                layers = sharded_backward_grid_update_banded(
                    layers, banded, geom_pad, ds.rig.camera,
                    cfg.ortho_backward, mesh,
                )
                kept = int((np.asarray(banded.ids) >= 0).sum())
                logger.info(
                    "ortho: row-band sharded over %d devices; band cull "
                    "kept %d/%d image slots (slab [%.1f, %.1f])",
                    n_tiles, kept, n_tiles * host_images.shape[0], elev_lo,
                    elev_hi,
                )
                id_offset += host_images.shape[0]
            layers = _crop_layers(layers, geom)
        else:
            id_offset = 0
            for ds in streams:
                quats_c, trans_c = ds.camera_poses()
                images = jnp.stack(
                    [jnp.asarray(im, jnp.float32) for im in ds.images]
                )
                layers = backward_grid_update(
                    layers,
                    jnp.asarray(quats_c, jnp.float32),
                    jnp.asarray(trans_c, jnp.float32),
                    images,
                    geom,
                    ds.rig.camera,
                    cfg.ortho_backward,
                    image_ids=(
                        jnp.arange(images.shape[0], dtype=jnp.int32)
                        + id_offset
                    ) if len(streams) > 1 else None,
                )
                id_offset += images.shape[0]
    if cfg.ortho_backward.colored_ortho:
        # colored_ortho packs RGB into float bits (grid_map's
        # colorVectorToValue convention); unpack for image/GeoTiff export.
        # Unobserved cells keep the NaN init — bit-casting that would give
        # (192, 0, 0); export them white like the grayscale path's 255.
        from aerial_mapper_tpu.image.color import unpack_float_to_rgb

        packed = np.asarray(layers["colored_ortho"])
        rgb01 = np.asarray(unpack_float_to_rgb(layers["colored_ortho"]))
        rgb = np.round(rgb01 * 255.0).astype(np.uint8)  # [H, W, 3]
        ortho = np.where(np.isnan(packed)[..., None], np.uint8(255), rgb)
    else:
        ortho = np.asarray(layers["ortho"])
    if output_layers_npz:
        save_layers(output_layers_npz,
                    {k: np.asarray(v) for k, v in layers.items()}, geom)
    if output_jpg:
        save_image(output_jpg, ortho)
    if output_geotiff:
        write_geotiff(
            output_geotiff, np.clip(ortho, 0, 255).astype(np.uint8),
            west=geom.west, north=geom.north, resolution=geom.resolution,
            utm_zone=utm_zone,
        )
    if output_report_html:
        from aerial_mapper_tpu.io.report import write_html_report
        from aerial_mapper_tpu.utils.timing import config_banner

        extra = ([("orthomosaic (RGB)", ortho)]
                 if cfg.ortho_backward.colored_ortho else None)
        write_html_report(
            output_report_html, layers, geom,
            title="Backward-grid orthomosaic run",
            config_banner=config_banner("Orthomosaic (backward grid)",
                                        cfg.ortho_backward),
            timings=timer.durations, extra_images=extra,
        )
    logger.info(timer.report())
    return layers, geom


def _homography_stream_prep(dataset: Dataset, cfg: PipelineConfig):
    """Host-side per-stream prep — image stacking/h2d + window
    sizing/validation. Kept OUTSIDE the timed mosaic stage (the stage
    timer reports device compute, not tunnel transfers — round-4
    review)."""
    quats_c, trans_c = dataset.camera_poses()
    images = jnp.stack(
        [jnp.asarray(im, jnp.float32) for im in dataset.images]
    )
    hcfg = cfg.ortho_homography
    if hcfg.auto_window and hcfg.window_rows == 0 and hcfg.window_cols == 0:
        win = _homography_auto_window(
            hcfg, dataset.rig.camera, quats_c, trans_c
        )
        if win is not None:
            import dataclasses

            hcfg = dataclasses.replace(
                hcfg, window_rows=win[0], window_cols=win[1]
            )
            logger.info("homography window: %dx%d of %dx%d mosaic",
                        win[0], win[1], hcfg.height_mosaic_pixels,
                        hcfg.width_mosaic_pixels)
    elif hcfg.window_rows > 0 or hcfg.window_cols > 0:
        # hand-set window: the device fit-check silently zeroes any image
        # whose footprint cannot fit — refuse to run such a config (ADVICE
        # r1; prefer auto_window)
        from aerial_mapper_tpu.ortho.homography import validate_window

        dropped = validate_window(hcfg, dataset.rig.camera, quats_c, trans_c)
        if dropped:
            raise ValueError(
                f"hand-set homography window {hcfg.window_rows}x"
                f"{hcfg.window_cols} would drop the entire contribution of "
                f"{len(dropped)} image(s) (first indices {dropped[:8]}); "
                "enlarge the window or use auto_window"
            )
    return (images, jnp.asarray(quats_c, jnp.float32),
            jnp.asarray(trans_c, jnp.float32), dataset.rig.camera, hcfg)


def _homography_stream_pass(prep, cfg: PipelineConfig, return_state: bool):
    """One stream's feather pass over prepped operands, sharded over
    devices when available. Returns the mosaic (single-stream callers,
    unchanged behavior) or the raw accumulators (``return_state``, for
    the multi-camera sum)."""
    images, quats, trans, cam, hcfg = prep
    import jax

    devices = jax.devices()
    if cfg.auto_shard and len(devices) > 1:
        from aerial_mapper_tpu.parallel.mesh import make_mesh
        from aerial_mapper_tpu.parallel.sharded import (
            sharded_homography_mosaic_batch,
        )

        mesh = make_mesh(("tiles",), shape=(len(devices),),
                         devices=devices)
        out = sharded_homography_mosaic_batch(
            images, quats, trans, cam, hcfg, mesh,
            needs_undistortion=cam.dist_kind != "none",
            return_state=return_state,
        )
        logger.info("homography mosaic: image-sharded over %d devices",
                    len(devices))
        return out
    return homography_mosaic_batch(
        images, quats, trans, cam, hcfg,
        needs_undistortion=cam.dist_kind != "none",
        return_state=return_state,
    )


def run_ortho_forward_homography(
    dataset: Dataset,
    cfg: PipelineConfig = PipelineConfig(),
    output_jpg: Optional[str] = None,
    output_geotiff: Optional[str] = None,
    output_report_html: Optional[str] = None,
    utm_zone: int = 32,
    datasets=None,
):
    """Homography mosaic demo (main-ortho-forward-homography.cc:42-103).

    ``datasets`` (per-camera list): the feather blend is a weighted SUM
    over images (cv::detail::FeatherBlender semantics), so multi-camera
    fusion folds each stream into shared (weighted_sum, weight_sum)
    accumulators — one pass per stream with its own camera/window — and
    divides once. Single-stream results are unchanged."""
    timer = StageTimer()
    streams = list(datasets) if datasets else [dataset]
    preps = [_homography_stream_prep(ds, cfg) for ds in streams]
    with timer.stage(
        "ortho_homography",
        work_items=(cfg.ortho_homography.width_mosaic_pixels
                    * cfg.ortho_homography.height_mosaic_pixels / 1e6),
    ):
        if len(streams) == 1:
            mosaic = _homography_stream_pass(preps[0], cfg,
                                             return_state=False)
        else:
            from aerial_mapper_tpu.ortho.homography import MosaicState

            num = den = None
            for prep in preps:
                state = _homography_stream_pass(prep, cfg,
                                                return_state=True)
                if num is None:
                    num, den = state.weighted_sum, state.weight_sum
                else:
                    num = num + state.weighted_sum
                    den = den + state.weight_sum
            mosaic = MosaicState(num, den).mosaic
    hcfg = cfg.ortho_homography
    mosaic = np.asarray(mosaic)
    if output_jpg:
        save_image(output_jpg, mosaic)
    if output_geotiff:
        west = hcfg.origin[0] - hcfg.width_mosaic_pixels / 2 * hcfg.resolution
        north = hcfg.origin[1] + hcfg.height_mosaic_pixels / 2 * hcfg.resolution
        # overview_nodata=0: the batch blend zeroes unobserved pixels
        # (ortho-forward-homography.cc:177-186), so pyramid levels must
        # not average that black background into footprint edges
        write_geotiff(
            output_geotiff, np.clip(mosaic, 0, 255).astype(np.uint8),
            west=west, north=north, resolution=hcfg.resolution,
            utm_zone=utm_zone, overview_nodata=0,
        )
    if output_report_html:
        from aerial_mapper_tpu.io.report import write_html_report
        from aerial_mapper_tpu.utils.timing import config_banner

        geom = MapGeometry(
            center_easting=hcfg.origin[0], center_northing=hcfg.origin[1],
            resolution=hcfg.resolution, height=hcfg.height_mosaic_pixels,
            width=hcfg.width_mosaic_pixels,
        )
        write_html_report(
            output_report_html, {}, geom,
            title="Forward-homography mosaic run",
            config_banner=config_banner("Orthomosaic (homography)", hcfg),
            timings=timer.durations,
            extra_images=[("mosaic", mosaic)],
        )
    logger.info(timer.report())
    return mosaic


def run_ortho_from_pcl(
    dataset: Optional[Dataset],
    cfg: PipelineConfig = PipelineConfig(),
    point_cloud: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    output_jpg: Optional[str] = None,
    output_geotiff: Optional[str] = None,
    output_report_html: Optional[str] = None,
    utm_zone: int = 32,
    datasets=None,
):
    """Ortho-from-points demo (main-ortho-from-pcl.cc): IDW of intensities.
    ``datasets`` (per-camera list) rasterizes the merged multi-camera
    cloud's intensities."""
    timer = StageTimer()
    geom = MapGeometry.from_config(cfg.grid)
    points, intens, valid = _resolve_cloud(dataset, cfg, timer, point_cloud,
                                           datasets)
    layers = dict(create_map_state(geom).layers)
    with timer.stage(
        "ortho_from_pcl", work_items=geom.height * geom.width / 1e6
    ):
        layers = ortho_from_points(
            layers, points, intens, valid, geom, cfg.ortho_from_pcl
        )
    ortho = np.asarray(layers["ortho"])
    if output_jpg:
        save_image(output_jpg, ortho)
    if output_geotiff:
        write_geotiff(
            output_geotiff, np.clip(ortho, 0, 255).astype(np.uint8),
            west=geom.west, north=geom.north, resolution=geom.resolution,
            utm_zone=utm_zone,
        )
    if output_report_html:
        from aerial_mapper_tpu.io.report import write_html_report
        from aerial_mapper_tpu.utils.timing import config_banner

        write_html_report(
            output_report_html, layers, geom,
            title="Ortho-from-points run",
            config_banner=config_banner("Orthomosaic (from points)",
                                        cfg.ortho_from_pcl),
            timings=timer.durations,
        )
    logger.info(timer.report())
    return layers, geom
