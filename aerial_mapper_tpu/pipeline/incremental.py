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
owner-routed with halo-strip exchange, and the image subset CULLED per row
band against a slab tracked across updates (VERDICT r3 #1): each window of
``check_every`` updates runs its culls against the previous window's
measured post-DSM elevation range widened by ``slab_margin_m``, then ONE
readback validates the window (accumulated routing overflow == 0 and the
measured range still inside the slab). A violated window is REPLAYED from
its snapshot with the always-exact replicated every-band layout (and a
doubled route capacity on overflow) — so per-device image bytes shrink
with the mesh while the result stays bit-identical to the single-device
driver (asserted by tests/test_cli.py). ``on_update`` callbacks are
deferred until their window validates (a redo would otherwise have
published wrong intermediate rasters).

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


def _frame_streams(streams, prestage: bool, start: int = 0):
    """Multi-stream analogue of ``_frame_stream``: yields
    ``(frame_index, [frame_per_stream])`` — each rig camera's frame i
    'arrives' together (synchronized rig capture)."""
    its = [_frame_stream(ds, prestage, start) for ds in streams]
    for items in zip(*its):
        yield items[0][0], [frame for _i, frame in items]


def _validate_streams(streams):
    """Multicam stream list sanity: equal lengths and one shared body
    trajectory (load_multicam_datasets guarantees both; hand-built lists
    must too, or the per-update pairing would silently mix frames)."""
    n = streams[0].num_frames
    for s, ds in enumerate(streams[1:], start=1):
        if ds.num_frames != n:
            raise ValueError(
                f"multicam stream {s} has {ds.num_frames} frames, "
                f"stream 0 has {n} — streams must be synchronized"
            )
        # quaternion double cover: q and -q are the same rotation, so a
        # stream normalized to the opposite hemisphere must still pass
        q0, q1 = np.asarray(streams[0].quats_G_B), np.asarray(ds.quats_G_B)
        quat_match = np.all(
            np.minimum(np.abs(q1 - q0).max(axis=1),
                       np.abs(q1 + q0).max(axis=1)) < 1e-8
        )
        if not (quat_match
                and np.allclose(ds.trans_G_B, streams[0].trans_G_B)):
            raise ValueError(
                f"multicam stream {s} carries a different body "
                "trajectory than stream 0 — per-camera datasets must "
                "share the rig's body poses"
            )


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


def _interleaved_multicam_ring(pair_ops_list):
    """S per-stream single-pair ``PairOperands`` -> one valid-masked
    ``RingPairOperands`` with 2S-1 slots.

    The ring layout reconstructs pair j's right frame from slot j+1's
    left frame — true for consecutive pairs of ONE stream, not across
    streams. Interleaving [L0, R0, L1, R1, .. L_{S-1}] (tail = R_{S-1})
    keeps that property for the REAL pairs at even slots (slot 2s: left
    L_s, next slot's frame is R_s) while the cross-stream filler slots
    at odd indices (R_s matched against L_{s+1}) carry ``pair_valid=
    False`` and contribute no points — so one fused ``sharded_map_step``
    routes ALL streams' pairs as a single merged cloud (the multicam
    batch composition per update, VERDICT r4 #5). S=1 reduces to exactly
    the single-stream ring (one slot, no fillers)."""
    from aerial_mapper_tpu.parallel.sharded import RingPairOperands

    s_count = len(pair_ops_list)
    frames, valid = [], []
    fields = {f: [] for f in ("T1_inv", "T2_inv", "corners_rect",
                              "R_G_C_rect", "t_G_C1", "baseline")}

    def push(ops, ok):
        for f in fields:
            fields[f].append(getattr(ops, f)[0])
        valid.append(ok)

    for s, ops in enumerate(pair_ops_list):
        frames.append(ops.image1[0])
        push(ops, True)
        if s < s_count - 1:
            # filler slot: left = R_s, right = L_{s+1}; operands are the
            # real pair's (any value — the slot's output is masked)
            frames.append(ops.image2[0])
            push(ops, False)
    return RingPairOperands(
        frames=jnp.stack(frames),
        tail=pair_ops_list[-1].image2[0],
        T1_inv=jnp.stack(fields["T1_inv"]),
        T2_inv=jnp.stack(fields["T2_inv"]),
        corners_rect=jnp.stack(fields["corners_rect"]),
        R_G_C_rect=jnp.stack(fields["R_G_C_rect"]),
        t_G_C1=jnp.stack(fields["t_G_C1"]),
        baseline=jnp.stack(fields["baseline"]),
        pair_valid=jnp.asarray(valid),
    )


def _maybe_bound_disparity_incremental(cfg: PipelineConfig, streams,
                                       update_every_nth: int):
    """Apply ``StereoConfig.disparity_from_slab`` to the incremental
    driver's matcher configs.

    The incremental driver only honors the flag when BOTH ``z_min`` and
    ``z_max`` are set: that user-declared envelope already z-filters
    every triangulated point, so bounding the search window to the
    disparities the envelope can produce drops only points the filter
    would drop anyway (and keeps the sharded/single-device bit-identity:
    both use the same static window). Deriving the window from the
    TRACKED slab instead would be unsound here — a bounded search cannot
    discover terrain outside its own window, so the slab validation
    could never observe a violation. Without the envelope the flag is
    ignored with a warning (the batch drivers run a prepass instead)."""
    import dataclasses as _dc

    if not cfg.stereo.disparity_from_slab:
        return cfg
    if cfg.stereo.z_min is None or cfg.stereo.z_max is None:
        logger.warning(
            "disparity_from_slab ignored by the incremental driver: set "
            "BOTH --stereo_z_min and --stereo_z_max (the declared "
            "envelope is the only sound slab here — the tracked slab "
            "cannot validate a window it bounded itself); running the "
            "full %d-disparity search", cfg.bm.num_disparities,
        )
        return cfg
    from aerial_mapper_tpu.io.poses import _rot_matrix_np
    from aerial_mapper_tpu.stereo.batched import disparity_range_from_slab

    lo_all, hi_all = None, None
    h, w = streams[0].images[0].shape[-2], streams[0].images[0].shape[-1]
    try:
        for ds in streams:
            quats_c, trans_c = ds.camera_poses()
            Rs = np.stack([_rot_matrix_np(q) for q in quats_c])
            # pairing cadence: updates match frames n-1, 2n-1, ... (the
            # (prev, i) chain) — the same stride/phase the range helper
            # models with use_every_nth
            lo, num = disparity_range_from_slab(
                ds.rig.camera.K, Rs, trans_c, (h, w),
                cfg.stereo.z_min, cfg.stereo.z_max,
                use_every_nth=update_every_nth,
            )
            lo_all = lo if lo_all is None else min(lo_all, lo)
            hi_all = lo + num if hi_all is None else max(hi_all, lo + num)
    except ValueError as e:
        logger.warning(
            "disparity_from_slab: %s — falling back to the full "
            "%d-disparity search", e, cfg.bm.num_disparities,
        )
        return cfg
    num_all = hi_all - lo_all
    logger.info(
        "incremental slab-bounded disparity search: envelope [%.1f, "
        "%.1f] m -> disparities [%d, %d) (%d vs %d full)",
        cfg.stereo.z_min, cfg.stereo.z_max, lo_all, hi_all, num_all,
        cfg.bm.num_disparities,
    )
    return _dc.replace(
        cfg,
        bm=_dc.replace(cfg.bm, min_disparity=lo_all,
                       num_disparities=num_all),
        sgm=_dc.replace(cfg.sgm, min_disparity=max(lo_all, 1),
                        num_disparities=num_all),
    )


def run_incremental(
    dataset: Dataset,
    cfg: PipelineConfig = PipelineConfig(),
    update_every_nth: int = 5,
    on_update: Optional[Callable] = None,
    prestage_images: bool = False,
    initial_layers: Optional[dict] = None,
    start_frame: int = 0,
    cull_images: bool = True,
    check_every: int = 8,
    slab_margin_m: float = 20.0,
    route_capacity_factor: float = 2.0,
    datasets=None,
    on_cloud: Optional[Callable] = None,
    cloud_stride: int = 67,
):
    """Stream the sequence; returns the final (layers, geom).

    ``on_update(step, layers, geom)`` is called after every map update — the
    framework's substitute for the reference's per-update ROS publish
    (main-ortho-backward-grid-incremental.cc:160). In the sharded mode the
    calls are deferred until the update's validation window passes (see
    below) and then flushed in order.

    ``on_cloud(step, points, valid)`` (optional) receives each update's
    newly triangulated stereo points decimated by ``cloud_stride``, as
    host numpy — the live point-cloud feed the reference publishes per
    frame (stereo.cpp:78-79 -> rviz). Costs one small d2h readback per
    update, so it is opt-in. The default stride is PRIME: the flat point
    buffer is row-major over the image, so a stride sharing a factor
    with the image width samples only a few pixel columns (stride 64 on
    a 320-wide image picked 5 columns — visible stripes in the preview).
    Single-device driver only: the sharded fused step never materializes
    the cloud outside the device mesh (a warning is logged and the
    callback skipped there).

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

    Sharded-mode scale-out knobs (ignored on a single device):
    ``cull_images`` enables the slab-tracked per-band image cull;
    ``check_every`` sets the validation window in updates (one scalar
    readback each — smaller = earlier error detection, larger = fewer
    dispatch-stream stalls); ``slab_margin_m`` widens the measured
    elevation range into the next window's cull slab (must exceed the
    terrain relief newly discovered within one window — violations are
    detected and replayed exactly, so the margin only affects how often
    the replay path pays the replicated-layout cost);
    ``route_capacity_factor`` is the initial all_to_all bucket capacity in
    fair-shares (doubled automatically on each overflow replay until the
    window routes losslessly).
    """
    if cfg.stereo.densifier != "stereo":
        raise ValueError(
            f"the incremental driver streams consecutive-pair virtual "
            f"stereo (the reference's mapping-on-the-fly contract, "
            f"stereo.cpp:127-147); densifier={cfg.stereo.densifier!r} is "
            "available in the batch drivers (run_dsm/run_dense_pcl/...)"
        )
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
    streams = list(datasets) if datasets else [dataset]
    if len(streams) > 1:
        _validate_streams(streams)
    multicam = len(streams) > 1
    cfg = _maybe_bound_disparity_incremental(cfg, streams,
                                             update_every_nth)
    mesh = _incremental_mesh(cfg)
    if mesh is not None:
        if on_cloud is not None:
            logger.warning(
                "on_cloud is unavailable in the sharded incremental "
                "driver (the fused step routes points inside the mesh "
                "and never materializes the cloud); skipping the "
                "callback — run with auto_shard=False for the live "
                "cloud feed"
            )
        return _run_incremental_sharded(
            streams, cfg, geom, mesh, update_every_nth, on_update,
            prestage_images, initial_layers, start_frame,
            cull_images=cull_images, check_every=check_every,
            slab_margin_m=slab_margin_m,
            route_capacity_factor=route_capacity_factor,
        )

    from aerial_mapper_tpu.io.poses import _rot_matrix_np

    n_frames = streams[0].num_frames
    layers = dict(create_map_state(geom).layers)
    if initial_layers is not None:
        layers.update(
            {k: jnp.asarray(v) for k, v in initial_layers.items()}
        )
    poses = [ds.camera_poses() for ds in streams]  # [(quats_c, trans_c)]
    Rs_s = [np.stack([_rot_matrix_np(q) for q in qc]) for qc, _t in poses]

    timer = StageTimer()
    images_subset = [[] for _ in streams]
    # frames kept at the previous update + their matcher-ready images
    prev = None
    prev_stereo = [None] * len(streams)
    for s, ds in enumerate(streams):
        prev, prev_stereo[s] = _resume_state(ds, cfg, start_frame,
                                             update_every_nth)
    num_updates = 0

    for i, frames in _frame_streams(streams, prestage_images, start_frame):
        for s, frame in enumerate(frames):
            images_subset[s].append(frame)

        if (i + 1) % update_every_nth != 0:
            continue

        cur_stereo = [
            _stereo_image_from(frame, ds, cfg)
            for frame, ds in zip(frames, streams)
        ]
        # stereo against the frames kept at the previous update (the
        # stereo.addFrame previous-frame chain, stereo.cpp:127-147) — one
        # pair per stream, MERGED into a single DSM update (the batch
        # driver's multicam_cloud composition applied per window); the
        # first update has no previous frame and skips the DSM delta
        if prev is not None:
            with timer.stage("incremental_dsm"):
                from aerial_mapper_tpu.stereo.batched import filter_points_z

                all_pts, all_valid = [], []
                for s, ds in enumerate(streams):
                    quats_c, trans_c = poses[s]
                    ops = prepare_pair_operands(
                        ds.rig.camera.K, Rs_s[s][[prev, i]],
                        trans_c[[prev, i]],
                        [prev_stereo[s], cur_stereo[s]],
                    )
                    pts, _intens, valid = process_pairs_batched(
                        ops, ds.rig.camera, matcher=cfg.stereo.matcher,
                        bm_cfg=cfg.bm, sgm_cfg=cfg.sgm, batch_chunk=1,
                    )
                    valid = filter_points_z(pts, valid, cfg.stereo.z_min,
                                            cfg.stereo.z_max)
                    all_pts.append(pts.reshape(-1, 3))
                    all_valid.append(valid.reshape(-1))
                merged_pts = jnp.concatenate(all_pts)
                merged_valid = jnp.concatenate(all_valid)
                layers = update_elevation_layer(
                    layers, merged_pts, merged_valid, geom, cfg.dsm,
                )
                if on_cloud is not None:
                    # ONE d2h transfer: valid rides as a 4th column
                    # (every readback is a ~35-75 ms tunnel round trip)
                    packed = np.asarray(jnp.concatenate([
                        merged_pts[::cloud_stride],
                        merged_valid[::cloud_stride, None].astype(
                            jnp.float32),
                    ], axis=1))
                    on_cloud(i, packed[:, :3], packed[:, 3] > 0.5)

        with timer.stage("incremental_ortho"):
            # one best-angle pass per stream; multicam carries GLOBAL
            # observation ids (stream s's frame j -> s*n_frames + j, the
            # batch driver's convention) so the fused observation_index
            # matches run_ortho_backward_grid's. Single-stream keeps the
            # reference's subset-relative ids (parity:
            # ortho-backward-grid.cc indexes the passed batch).
            frame_lo = i - len(images_subset[0]) + 1
            for s, ds in enumerate(streams):
                quats_c, trans_c = poses[s]
                sub = slice(frame_lo, i + 1)
                layers = backward_grid_update(
                    layers,
                    jnp.asarray(quats_c[sub], jnp.float32),
                    jnp.asarray(trans_c[sub], jnp.float32),
                    jnp.stack(images_subset[s]),
                    geom,
                    ds.rig.camera,
                    cfg.ortho_backward,
                    image_ids=(
                        jnp.arange(frame_lo, i + 1, dtype=jnp.int32)
                        + s * n_frames
                    ) if multicam else None,
                )
        prev = i
        prev_stereo = cur_stereo
        num_updates += 1
        if on_update is not None:
            on_update(i, layers, geom)
        for sub_list in images_subset:
            sub_list.clear()

    logger.info("incremental: %d map updates (%d camera streams)",
                num_updates, len(streams))
    logger.info(timer.report())
    return layers, geom


def _run_incremental_sharded(
    streams,
    cfg: PipelineConfig,
    geom: MapGeometry,
    mesh,
    update_every_nth: int,
    on_update: Optional[Callable],
    prestage_images: bool = False,
    initial_layers: Optional[dict] = None,
    start_frame: int = 0,
    cull_images: bool = True,
    check_every: int = 8,
    slab_margin_m: float = 20.0,
    route_capacity_factor: float = 2.0,
):
    """Mesh-sharded incremental driver: one fused ``sharded_map_step`` per
    update, with slab-tracked per-band image culling validated (and, on
    violation or routing overflow, replayed exactly) once per
    ``check_every``-update window — a single scalar readback each, so the
    dispatch stream stays asynchronous between windows (VERDICT r3 #1/#4;
    the reference re-rasterizes against only the new image subset,
    main-ortho-backward-grid-incremental.cc:143-166, and this is that
    contract at mesh scale with per-device image bytes shrinking).

    ``streams``: per-camera Dataset list (length 1 = the classic single-
    stream mode, bit-identical to before). Multicam (VERDICT r4 #5): each
    update runs ONE stereo pair per stream — the pairs interleave into a
    single valid-masked ring so the fused step routes the MERGED cloud in
    one pass (``_interleaved_multicam_ring``) — then one banded best-angle
    ortho pass per stream with GLOBAL observation ids (stream s's frame j
    -> s*n_frames + j, the batch driver's convention at
    pipeline/batch.py:399-428). The fused stereo triangulates through
    stream 0's intrinsics, so every stream's camera must share
    (fx, fy, cx, cy, W, H); heterogeneous rigs get a clear error and can
    run --no-auto_shard (per-stream intrinsics) instead.

    Memory profile: deferred ``on_update`` payloads are staged to HOST
    memory as they are recorded (VERDICT r4 #6) — each update's cropped
    layer set starts an async d2h copy immediately and resolves to numpy
    one update later (the copy gets a full update step of wall-clock to
    complete, so the resolve rarely blocks the dispatch stream). Device
    retention is therefore O(1) layer sets regardless of ``check_every``:
    the window snapshot plus at most one in-flight copy. Host retention
    is up to ``check_every`` numpy layer sets (9 x H x W x 4 bytes each)
    — host RAM, not HBM. Callbacks consequently receive numpy arrays in
    this mode. Multi-process meshes skip the staging (a rank cannot
    materialize the full global array) and keep device references — the
    earlier (check_every+1)-sets-on-device profile applies there."""
    from aerial_mapper_tpu.io.poses import _rot_matrix_np
    from aerial_mapper_tpu.parallel.sharded import (
        band_image_operands,
        pad_map_geometry,
        pad_ring_pairs,
        replicated_band_images,
        shard_layers,
        sharded_backward_grid_update,
        sharded_map_step,
    )

    cam = streams[0].rig.camera
    multicam = len(streams) > 1
    n_frames = streams[0].num_frames
    if multicam:
        for s, ds in enumerate(streams[1:], start=1):
            c = ds.rig.camera
            if (c.fx, c.fy, c.cx, c.cy, c.width, c.height) != (
                    cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height):
                raise ValueError(
                    f"sharded multicam incremental requires every stream "
                    f"to share stream 0's intrinsics (fused-step "
                    f"triangulation is static in one camera); stream {s} "
                    "differs — run with auto_shard=False for per-stream "
                    "intrinsics"
                )
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
    poses = [ds.camera_poses() for ds in streams]  # [(quats_c, trans_c)]
    Rs_s = [np.stack([_rot_matrix_np(q) for q in qc]) for qc, _t in poses]

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
    prev = None
    prev_stereo = [None] * len(streams)
    for s, ds in enumerate(streams):
        prev, prev_stereo[s] = _resume_state(ds, cfg, start_frame,
                                             update_every_nth)
    num_updates = 0
    capacity_factor = route_capacity_factor
    # cull slab (lo, hi) host floats; None = no trustworthy slab yet.
    # FLAT-PLANE ortho (use_digital_elevation_map=False) reads every cell
    # at orthomosaic_elevation_m, NOT the DSM — its cull slab is that
    # constant, exact from update 1, and the measured DSM range is
    # irrelevant to it (validating against it could both miss real
    # violations and flag false ones).
    flat_plane = not cfg.ortho_backward.use_digital_elevation_map
    if flat_plane:
        e0 = cfg.ortho_backward.orthomosaic_elevation_m
        slab = (e0 - 1e-3, e0 + 1e-3)
    else:
        slab = None

    def crop(ls):
        if pad_rows == 0:
            return ls
        return {k: v[: geom.height] for k, v in ls.items()}

    def make_banded(s, imgs_dev, frame_ids, use_cull):
        """Stream s's per-band (or replicated) image layout for one
        update's subset, with GLOBAL observation ids under multicam."""
        quats_c, trans_c = poses[s]
        q_np = np.asarray(quats_c[frame_ids])
        t_np = np.asarray(trans_c[frame_ids])
        if use_cull and slab is not None:
            # rebuild the banded layouts from the HOST copies: the cull
            # reorders/pads the stack on the host, so feeding it the
            # device subset would cost a d2h readback (a ~35-75 ms tunnel
            # sync) on every culled update. capacity_multiple buckets the
            # padded capacity (a compiled shape) so cull tightness
            # drifting by one image does not recompile the fused step.
            host_imgs = np.stack([
                np.asarray(streams[s].images[j], np.float32)
                for j in frame_ids
            ])
            banded = band_image_operands(
                geom_pad, n_tiles, q_np, t_np, host_imgs,
                streams[s].rig.camera,
                elev_min=slab[0], elev_max=slab[1], capacity_multiple=2,
            )
        else:
            banded = replicated_band_images(q_np, t_np, imgs_dev)
        if multicam:
            # global ids: the banded ids index the passed subset stack
            # (frames frame_ids[0]..frame_ids[-1] in order), so the
            # absolute id is ids + frame_ids[0], offset by the stream base
            offset = s * n_frames + frame_ids[0]
            banded = banded._replace(ids=jnp.where(
                banded.ids >= 0, banded.ids + offset, banded.ids
            ))
        return banded

    def ortho_only(layers, s, banded):
        """One stream's banded/replicated sharded ortho pass."""
        gb = to_global(banded)
        scam = streams[s].rig.camera
        if gb.ids.ndim == 1:  # replicated every-band layout
            layers = sharded_backward_grid_update(
                layers, gb.quats, gb.ts, gb.images,
                geom_pad, scam, cfg.ortho_backward, mesh,
                image_ids=gb.ids if multicam else None,
            )
        else:
            from aerial_mapper_tpu.parallel.sharded import (
                sharded_backward_grid_update_banded,
            )

            layers = sharded_backward_grid_update_banded(
                layers, gb, geom_pad, scam, cfg.ortho_backward, mesh,
            )
        return layers

    def do_update(state, i, imgs_dev_s, frame_ids, cur_stereo, use_cull):
        """One fused map update (all streams); returns
        (state', diag | None). ``imgs_dev_s``/``cur_stereo``: per-stream
        lists (subset stacks, matcher-ready current frames)."""
        layers, prev, prev_stereo = state
        bandeds = [
            make_banded(s, imgs_dev_s[s], frame_ids, use_cull)
            for s in range(len(streams))
        ]
        if prev is not None:
            pair_ops = [
                prepare_pair_operands(
                    streams[s].rig.camera.K, Rs_s[s][[prev, i]],
                    poses[s][1][[prev, i]],
                    [prev_stereo[s], cur_stereo[s]],
                )
                for s in range(len(streams))
            ]
            ring = _interleaved_multicam_ring(pair_ops)
            ring = pad_ring_pairs(ring, n_devices)
            layers, diag = sharded_map_step(
                layers, to_global(ring), to_global(bandeds[0]), geom_pad,
                cam, cfg.dsm, cfg.ortho_backward, mesh,
                matcher=cfg.stereo.matcher, bm_cfg=cfg.bm,
                sgm_cfg=cfg.sgm, route_capacity_factor=capacity_factor,
                z_min=cfg.stereo.z_min, z_max=cfg.stereo.z_max,
            )
            for s in range(1, len(streams)):
                layers = ortho_only(layers, s, bandeds[s])
        else:
            # first update: no stereo pair exists yet; ortho-only update,
            # exactly the single-device driver's first step. The layout
            # may already be CULLED here (flat-plane mode's constant slab
            # is exact from update 1) — dispatch like the fused step does.
            for s in range(len(streams)):
                layers = ortho_only(layers, s, bandeds[s])
            diag = None
        return (layers, i, cur_stereo), diag

    # ---- validation-window state ------------------------------------
    # snapshot = driver state at window start (device arrays held by
    # reference — the rewind target); records = enough host-side info to
    # replay every update of the window; accumulators live ON DEVICE and
    # are read back once per window.
    state = (layers, prev, prev_stereo)
    win_snapshot = state
    win_records = []  # (i, [frame indices of the subset])
    win_culled = False  # any update in this window used a culled layout
    win_ovf = jnp.int32(0)
    win_lo = jnp.float32(jnp.inf)
    win_hi = jnp.float32(-jnp.inf)
    pending = []  # resolved deferred payloads: (i, layers dict)
    staged = None  # (i, cropped device layers) with an async d2h started

    def flush_staged():
        """Resolve the in-flight host copy to numpy and drop the device
        references (frees the staged layer set's HBM)."""
        nonlocal staged
        if staged is not None:
            si, cropped = staged
            pending.append(
                (si, {k: np.asarray(v) for k, v in cropped.items()})
            )
            staged = None

    def stage_pending(i, cropped):
        """Record a deferred on_update payload: start its d2h copy now,
        resolve it at the NEXT record (or window close) so the copy
        overlaps a full update step. Multi-process mode keeps device
        references (global arrays are not rank-materializable)."""
        nonlocal staged
        flush_staged()
        if multiproc:
            pending.append((i, cropped))
            return
        for v in cropped.values():
            try:
                v.copy_to_host_async()
            except AttributeError:
                pass
        staged = (i, cropped)

    def accumulate(diag):
        nonlocal win_ovf, win_lo, win_hi
        if diag is None:
            return
        win_ovf = win_ovf + diag.overflow
        win_lo = jnp.minimum(win_lo, diag.elev_min)
        win_hi = jnp.maximum(win_hi, diag.elev_max)

    def reset_window():
        nonlocal win_snapshot, win_records, win_culled
        nonlocal win_ovf, win_lo, win_hi
        win_snapshot = state
        win_records = []
        win_culled = False
        win_ovf = jnp.int32(0)
        win_lo = jnp.float32(jnp.inf)
        win_hi = jnp.float32(-jnp.inf)

    def _read_scalars(ovf, lo, hi):
        """ONE scalar readback of stacked (overflow, elev_lo, elev_hi) —
        each rank reads its own replica, so multi-process control flow
        stays in lockstep."""
        stacked = jnp.stack([ovf.astype(jnp.float32), lo, hi])
        if hasattr(stacked, "addressable_shards"):
            vals = np.asarray(stacked.addressable_shards[0].data)
        else:
            vals = np.asarray(stacked)
        return int(vals[0]), float(vals[1]), float(vals[2])

    def read_window():
        return _read_scalars(win_ovf, win_lo, win_hi)

    def replay_window():
        """Redo every update of the failed window from its snapshot with
        the always-exact replicated layout; retries with doubled routing
        capacity while overflow persists (bounded — capacity eventually
        reaches the no-drop bound of one full local cloud)."""
        nonlocal state, capacity_factor, win_ovf, win_lo, win_hi, pending
        for attempt in range(6):
            state_r = win_snapshot
            ovf = jnp.int32(0)
            lo = jnp.float32(jnp.inf)
            hi = jnp.float32(-jnp.inf)
            redo_pending = []
            for i, frame_ids in win_records:
                imgs_s = [
                    jnp.stack([
                        jnp.asarray(ds.images[j], jnp.float32)
                        for j in frame_ids
                    ])
                    for ds in streams
                ]
                cur = [
                    _stereo_image_from(imgs_s[s][-1], ds, cfg)
                    for s, ds in enumerate(streams)
                ]
                state_r, diag = do_update(
                    state_r, i, imgs_s, frame_ids, cur, use_cull=False,
                )
                if diag is not None:
                    ovf = ovf + diag.overflow
                    lo = jnp.minimum(lo, diag.elev_min)
                    hi = jnp.maximum(hi, diag.elev_max)
                if on_update is not None:
                    # replay is the rare error path: resolve to host
                    # immediately (same O(1) device retention contract)
                    c = crop(state_r[0])
                    redo_pending.append((i, c if multiproc else {
                        k: np.asarray(v) for k, v in c.items()
                    }))
            n_ovf, r_lo, r_hi = _read_scalars(ovf, lo, hi)
            if n_ovf == 0:
                state = state_r
                win_ovf, win_lo, win_hi = jnp.int32(0), \
                    jnp.float32(r_lo), jnp.float32(r_hi)
                pending = redo_pending
                return r_lo, r_hi
            capacity_factor *= 2.0
            logger.warning(
                "incremental window replay dropped %d routed points; "
                "retrying with route_capacity_factor=%.1f",
                n_ovf, capacity_factor,
            )
        raise RuntimeError(
            "incremental sharded window kept overflowing after capacity "
            f"retries (route_capacity_factor={capacity_factor})"
        )

    def close_window():
        """Validate the window; on failure rewind + replay it exactly.
        Updates the slab from the (validated) measured elevation range and
        flushes the deferred on_update callbacks."""
        nonlocal slab, capacity_factor, pending
        flush_staged()
        if win_records:
            overflow, lo, hi = read_window()
            bad_slab = (
                win_culled and slab is not None and not flat_plane
                and np.isfinite(lo)
                and (lo < slab[0] or hi > slab[1])
            )
            if overflow or bad_slab:
                if overflow:
                    capacity_factor *= 2.0
                logger.warning(
                    "incremental window invalid (overflow=%d, slab %s, "
                    "measured [%.2f, %.2f]); replaying %d updates with "
                    "replicated images%s",
                    overflow, slab, lo, hi, len(win_records),
                    f" and route_capacity_factor={capacity_factor}"
                    if overflow else "",
                )
                lo, hi = replay_window()
            if not flat_plane and np.isfinite(lo) and np.isfinite(hi):
                slab = (lo - slab_margin_m, hi + slab_margin_m)
            if on_update is not None:
                for i, cropped in pending:
                    on_update(i, cropped, geom)
        pending = []
        reset_window()

    images_subset = [[] for _ in streams]
    for i, frames in _frame_streams(streams, prestage_images, start_frame):
        for s, frame in enumerate(frames):
            images_subset[s].append(frame)

        if (i + 1) % update_every_nth != 0:
            continue

        cur_stereo = [
            _stereo_image_from(frame, ds, cfg)
            for frame, ds in zip(frames, streams)
        ]
        frame_ids = list(range(i - len(images_subset[0]) + 1, i + 1))
        with timer.stage("incremental_step"):
            use_cull = cull_images and slab is not None
            state, diag = do_update(
                state, i, [jnp.stack(sub) for sub in images_subset],
                frame_ids, cur_stereo, use_cull,
            )
            accumulate(diag)
        win_records.append((i, frame_ids))
        win_culled = win_culled or use_cull
        if on_update is not None:
            stage_pending(i, crop(state[0]))
        num_updates += 1
        if len(win_records) >= check_every:
            with timer.stage("incremental_validate"):
                close_window()
        for sub_list in images_subset:
            sub_list.clear()

    close_window()
    logger.info(
        "incremental (sharded over %d devices, %d camera streams): %d "
        "map updates, final cull slab %s, route_capacity_factor %.1f",
        n_devices, len(streams), num_updates, slab, capacity_factor,
    )
    logger.info(timer.report())
    return crop(state[0]), geom
