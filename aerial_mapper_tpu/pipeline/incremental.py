"""Incremental "mapping on the fly" driver.

Replays ``main-ortho-backward-grid-incremental.cc:143-166`` (SURVEY.md §3.4):
stream frames one by one; every n-th frame, run virtual stereo against the
previous frame, update the DSM from only the new stereo cloud, and
re-rasterize the backward-grid ortho against only the accumulated new image
subset. The best-angle layer makes the ortho update idempotent and
order-independent (ortho-backward-grid.cc:180-183), which is what makes this
incremental contract valid — verified by
tests/test_ortho.py::test_backward_grid_incremental_equals_batch.

Unlike the reference, the DSM does not rebuild a kd-tree per update
(dsm.cc:195 rebuilds from scratch); grid-binned IDW consumes just the new
points and only touches cells in their windows' footprints.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.config import PipelineConfig
from aerial_mapper_tpu.dsm.idw import update_elevation_layer
from aerial_mapper_tpu.mapgrid.grid import MapGeometry, create_map_state
from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update
from aerial_mapper_tpu.pipeline.dataset import Dataset
from aerial_mapper_tpu.stereo.pipeline import VirtualStereo
from aerial_mapper_tpu.utils.timing import StageTimer

logger = logging.getLogger("aerial_mapper_tpu")


def run_incremental(
    dataset: Dataset,
    cfg: PipelineConfig = PipelineConfig(),
    update_every_nth: int = 5,
    on_update: Optional[Callable] = None,
):
    """Stream the sequence; returns the final (layers, geom).

    ``on_update(step, layers, geom)`` is called after every map update — the
    framework's substitute for the reference's per-update ROS publish
    (main-ortho-backward-grid-incremental.cc:160).
    """
    geom = MapGeometry.from_config(cfg.grid)
    layers = dict(create_map_state(geom).layers)
    engine = VirtualStereo(
        dataset.rig.camera, cfg.stereo, bm_cfg=cfg.bm, sgm_cfg=cfg.sgm
    )
    quats_c, trans_c = dataset.camera_poses()
    from aerial_mapper_tpu.io.poses import _rot_matrix_np

    timer = StageTimer()
    images_subset = []
    quats_subset, trans_subset = [], []
    num_updates = 0

    for i in range(dataset.num_frames):
        image = jnp.asarray(dataset.images[i], jnp.float32)
        images_subset.append(image)
        quats_subset.append(quats_c[i])
        trans_subset.append(trans_c[i])

        if (i + 1) % update_every_nth != 0:
            continue

        # stereo against the previous streamed frame (stereo.addFrame chain)
        result = engine.add_frame(
            _rot_matrix_np(quats_c[i]), trans_c[i], image
        )
        if result is not None:
            with timer.stage("incremental_dsm"):
                layers = update_elevation_layer(
                    layers, result.points, result.valid, geom, cfg.dsm
                )

        with timer.stage("incremental_ortho"):
            layers = backward_grid_update(
                layers,
                jnp.asarray(np.asarray(quats_subset), jnp.float32),
                jnp.asarray(np.asarray(trans_subset), jnp.float32),
                jnp.stack(images_subset),
                geom,
                dataset.rig.camera,
                cfg.ortho_backward,
            )
        num_updates += 1
        if on_update is not None:
            on_update(i, layers, geom)
        images_subset.clear()
        quats_subset.clear()
        trans_subset.clear()

    logger.info("incremental: %d map updates", num_updates)
    logger.info(timer.report())
    return layers, geom
