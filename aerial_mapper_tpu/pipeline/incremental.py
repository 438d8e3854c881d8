"""Incremental "mapping on the fly" driver — single-device or mesh-sharded.

Replays ``main-ortho-backward-grid-incremental.cc:143-166`` (SURVEY.md §3.4):
stream frames one by one; every n-th frame, run virtual stereo against the
frame kept at the previous update, update the DSM from only the new stereo
cloud, and re-rasterize the backward-grid ortho against only the accumulated
new image subset. The best-angle layer makes the ortho update idempotent and
order-independent (ortho-backward-grid.cc:180-183), which is what makes this
incremental contract valid — verified by
tests/test_ortho.py::test_backward_grid_incremental_equals_batch.

Unlike the reference, the DSM does not rebuild a kd-tree per update
(dsm.cc:195 rebuilds from scratch); grid-binned IDW consumes just the new
points and only touches cells in their windows' footprints.

Multi-device mode (``cfg.auto_shard`` and >1 device): every update is ONE
fused ``sharded_map_step`` on a (1, n_devices) (pairs, tiles) mesh — the
pair padded to the device count (``pad_ring_pairs``), the map rasters
row-band-sharded on a south-padded geometry (``pad_map_geometry``), points
owner-routed with halo-strip exchange, and the image subset broadcast in
the replicated every-band layout (no elevation slab is knowable before the
step's own DSM update, see ``replicated_band_images``). Bit-identical to
the single-device driver (asserted by tests/test_cli.py).

Both modes share the same per-update computation (batched pair operands ->
``process_pairs_batched`` -> binned IDW -> backward-grid), so the
single-device path compiles one program per shape and replays it for the
whole stream.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.config import PipelineConfig
from aerial_mapper_tpu.dsm.idw import update_elevation_layer
from aerial_mapper_tpu.mapgrid.grid import MapGeometry, create_map_state
from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update
from aerial_mapper_tpu.pipeline.dataset import Dataset
from aerial_mapper_tpu.stereo.batched import (
    prepare_pair_operands,
    process_pairs_batched,
)
from aerial_mapper_tpu.utils.timing import StageTimer

logger = logging.getLogger("aerial_mapper_tpu")


def _incremental_mesh(cfg: PipelineConfig):
    """(pairs=1, tiles=n_devices) mesh, or None on one device/opt-out."""
    if not cfg.auto_shard:
        return None
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    from aerial_mapper_tpu.parallel.mesh import make_mesh

    return make_mesh(("pairs", "tiles"), shape=(1, len(devices)),
                     devices=devices)


def _stereo_image_from(image: jax.Array, dataset: Dataset,
                       cfg: PipelineConfig):
    """An already-on-device frame prepared for matching: grayscale +
    undistorted (the batch driver's preprocessing, pipeline/batch.py
    _stereo_cloud). Taking the device array avoids re-transferring the
    frame the subset accumulation already moved (each h2d costs real
    wall-clock on the tunnel)."""
    if image.ndim == 3:
        from aerial_mapper_tpu.image.color import rgb_to_gray

        image = rgb_to_gray(image)
    if cfg.stereo.images_need_undistortion:
        from aerial_mapper_tpu.camera.undistort import undistort_image

        image = undistort_image(dataset.rig.camera, image)
    return image


def _frame_stream(dataset: Dataset, prestage: bool, start: int = 0):
    """Device-resident (frame_index, frame) pairs from ``start`` on.

    ``prestage=False`` (streaming semantics): each frame is transferred
    as it 'arrives' — the honest mapping-on-the-fly mode. ``True``: the
    whole sequence moves to the device in ONE bulk transfer up front, so
    the loop measures pure dispatch + compute (the throughput mode for a
    dataset already on disk; 249 small transfers cost far more than one
    large one on the tunnel)."""
    if prestage:
        stack = jnp.asarray(np.stack(dataset.images[start:]), jnp.float32)
        for i in range(start, dataset.num_frames):
            yield i, stack[i - start]
    else:
        for i in range(start, dataset.num_frames):
            yield i, jnp.asarray(dataset.images[i], jnp.float32)


def _resume_state(dataset: Dataset, cfg: PipelineConfig, start_frame: int,
                  update_every_nth: int):
    """(prev, prev_stereo) for a resumed stream: the frame kept at the
    last update before ``start_frame`` (= start_frame - 1, which is why
    resume points must sit on an update boundary)."""
    if start_frame == 0:
        return None, None
    if start_frame % update_every_nth != 0:
        raise ValueError(
            f"start_frame {start_frame} must be a multiple of "
            f"update_every_nth {update_every_nth} (resume continues from "
            "an update boundary so the previous-frame pairing chain is "
            "reconstructible)"
        )
    prev = start_frame - 1
    frame = jnp.asarray(dataset.images[prev], jnp.float32)
    return prev, _stereo_image_from(frame, dataset, cfg)


def run_incremental(
    dataset: Dataset,
    cfg: PipelineConfig = PipelineConfig(),
    update_every_nth: int = 5,
    on_update: Optional[Callable] = None,
    prestage_images: bool = False,
    initial_layers: Optional[dict] = None,
    start_frame: int = 0,
):
    """Stream the sequence; returns the final (layers, geom).

    ``on_update(step, layers, geom)`` is called after every map update — the
    framework's substitute for the reference's per-update ROS publish
    (main-ortho-backward-grid-incremental.cc:160).

    ``prestage_images``: move the whole sequence to the device in one bulk
    transfer up front instead of per-frame as the stream arrives — the
    throughput mode for on-disk datasets (see ``_frame_stream``).

    ``initial_layers`` + ``start_frame``: resume mapping onto a previously
    saved map state (``io.artifacts.load_layers``), continuing the stream
    from ``start_frame`` (a multiple of ``update_every_nth`` — the frame
    right after the checkpointed run's last update). The result is
    EXACTLY the uninterrupted run's map (asserted by tests/test_cli.py):
    the saved layers equal the full run's state at that point, and every
    later update consumes only them plus the remaining frames. Shapes
    must match ``cfg.grid``.
    """
    geom = MapGeometry.from_config(cfg.grid)
    if initial_layers is not None:
        bad = {
            k: v.shape for k, v in initial_layers.items()
            if v.shape[:2] != (geom.height, geom.width)
        }
        if bad:
            raise ValueError(
                f"initial_layers shapes {bad} do not match the configured "
                f"{geom.height}x{geom.width} grid"
            )
    mesh = _incremental_mesh(cfg)
    if mesh is not None:
        return _run_incremental_sharded(
            dataset, cfg, geom, mesh, update_every_nth, on_update,
            prestage_images, initial_layers, start_frame,
        )

    from aerial_mapper_tpu.io.poses import _rot_matrix_np

    cam = dataset.rig.camera
    layers = dict(create_map_state(geom).layers)
    if initial_layers is not None:
        layers.update(
            {k: jnp.asarray(v) for k, v in initial_layers.items()}
        )
    quats_c, trans_c = dataset.camera_poses()
    Rs = np.stack([_rot_matrix_np(q) for q in quats_c])

    timer = StageTimer()
    images_subset = []
    quats_subset, trans_subset = [], []
    # frame kept at the previous update + its matcher-ready device image
    prev, prev_stereo = _resume_state(dataset, cfg, start_frame,
                                      update_every_nth)
    num_updates = 0

    for i, frame in _frame_stream(dataset, prestage_images, start_frame):
        images_subset.append(frame)
        quats_subset.append(quats_c[i])
        trans_subset.append(trans_c[i])

        if (i + 1) % update_every_nth != 0:
            continue

        cur_stereo = _stereo_image_from(frame, dataset, cfg)
        # stereo against the frame kept at the previous update (the
        # stereo.addFrame previous-frame chain, stereo.cpp:127-147); the
        # first update has no previous frame and skips the DSM delta
        if prev is not None:
            ops = prepare_pair_operands(
                cam.K, Rs[[prev, i]], trans_c[[prev, i]],
                [prev_stereo, cur_stereo],
            )
            with timer.stage("incremental_dsm"):
                pts, _intens, valid = process_pairs_batched(
                    ops, cam, matcher=cfg.stereo.matcher, bm_cfg=cfg.bm,
                    sgm_cfg=cfg.sgm, batch_chunk=1,
                )
                layers = update_elevation_layer(
                    layers, pts.reshape(-1, 3), valid.reshape(-1), geom,
                    cfg.dsm,
                )

        with timer.stage("incremental_ortho"):
            layers = backward_grid_update(
                layers,
                jnp.asarray(np.asarray(quats_subset), jnp.float32),
                jnp.asarray(np.asarray(trans_subset), jnp.float32),
                jnp.stack(images_subset),
                geom,
                cam,
                cfg.ortho_backward,
            )
        prev = i
        prev_stereo = cur_stereo
        num_updates += 1
        if on_update is not None:
            on_update(i, layers, geom)
        images_subset.clear()
        quats_subset.clear()
        trans_subset.clear()

    logger.info("incremental: %d map updates", num_updates)
    logger.info(timer.report())
    return layers, geom


def _run_incremental_sharded(
    dataset: Dataset,
    cfg: PipelineConfig,
    geom: MapGeometry,
    mesh,
    update_every_nth: int,
    on_update: Optional[Callable],
    prestage_images: bool = False,
    initial_layers: Optional[dict] = None,
    start_frame: int = 0,
):
    """Mesh-sharded incremental driver: one fused ``sharded_map_step`` per
    update. Overflow is accumulated on device and checked once at the end
    (a per-update readback would serialize the dispatch stream)."""
    from aerial_mapper_tpu.io.poses import _rot_matrix_np
    from aerial_mapper_tpu.parallel.sharded import (
        pad_map_geometry,
        pad_ring_pairs,
        prepare_ring_pair_operands,
        replicated_band_images,
        shard_layers,
        sharded_map_step,
    )

    cam = dataset.rig.camera
    n_devices = mesh.devices.size
    n_tiles = mesh.shape["tiles"]
    geom_pad, pad_rows = pad_map_geometry(geom, n_tiles)
    start = dict(create_map_state(geom_pad).layers)
    if initial_layers is not None:
        # resume: splice the saved rows above the fresh southern padding
        start.update({
            k: jnp.concatenate([jnp.asarray(v), start[k][geom.height:]])
            if pad_rows else jnp.asarray(v)
            for k, v in initial_layers.items()
        })
    layers = shard_layers(start, mesh, "tiles")
    quats_c, trans_c = dataset.camera_poses()
    Rs = np.stack([_rot_matrix_np(q) for q in quats_c])

    # multi-process meshes need globally-addressable operands: every rank
    # streams the same frames (per-host datasets are identical replicas in
    # this driver), so the replicated globalization is exact
    multiproc = jax.process_count() > 1

    def to_global(tree):
        if not multiproc:
            return tree
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P

        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P()
            ),
            tree,
        )

    timer = StageTimer()
    images_subset = []
    quats_subset, trans_subset = [], []
    prev, prev_stereo = _resume_state(dataset, cfg, start_frame,
                                      update_every_nth)
    num_updates = 0
    total_overflow = None  # device-accumulated; read back once at the end

    def crop(ls):
        if pad_rows == 0:
            return ls
        return {k: v[: geom.height] for k, v in ls.items()}

    for i, frame in _frame_stream(dataset, prestage_images, start_frame):
        images_subset.append(frame)
        quats_subset.append(quats_c[i])
        trans_subset.append(trans_c[i])

        if (i + 1) % update_every_nth != 0:
            continue

        banded = replicated_band_images(
            np.asarray(quats_subset), np.asarray(trans_subset),
            jnp.stack(images_subset),
        )
        cur_stereo = _stereo_image_from(frame, dataset, cfg)
        if prev is not None:
            with timer.stage("incremental_step"):
                ring = prepare_ring_pair_operands(
                    cam.K, Rs[[prev, i]], trans_c[[prev, i]],
                    [prev_stereo, cur_stereo],
                )
                ring = pad_ring_pairs(ring, n_devices)
                layers, diag = sharded_map_step(
                    layers, to_global(ring), to_global(banded), geom_pad,
                    cam, cfg.dsm, cfg.ortho_backward, mesh,
                    matcher=cfg.stereo.matcher, bm_cfg=cfg.bm,
                    sgm_cfg=cfg.sgm,
                )
                total_overflow = (
                    diag.overflow if total_overflow is None
                    else total_overflow + diag.overflow
                )
        else:
            # first update: no stereo pair exists yet; ortho-only update,
            # exactly the single-device driver's first step
            from aerial_mapper_tpu.parallel.sharded import (
                sharded_backward_grid_update,
            )

            with timer.stage("incremental_step"):
                gb = to_global(banded)
                layers = sharded_backward_grid_update(
                    layers, gb.quats, gb.ts, gb.images,
                    geom_pad, cam, cfg.ortho_backward, mesh,
                )
        prev = i
        prev_stereo = cur_stereo
        num_updates += 1
        if on_update is not None:
            on_update(i, crop(layers), geom)
        images_subset.clear()
        quats_subset.clear()
        trans_subset.clear()

    overflow = 0 if total_overflow is None else int(
        np.asarray(total_overflow.addressable_shards[0].data)
    )
    if overflow:
        raise RuntimeError(
            f"incremental sharded run dropped {overflow} routed points; "
            "raise route_capacity_factor"
        )
    logger.info("incremental (sharded over %d devices): %d map updates",
                n_devices, num_updates)
    logger.info(timer.report())
    return crop(layers), geom
