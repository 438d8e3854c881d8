"""Slab-tracked band culling + recovery in the sharded incremental driver
(VERDICT r3 #1/#4): per-band image subsets must actually shrink, results
must stay bit-identical to the single-device driver, and both failure
paths (cull-slab violation, routing overflow) must recover exactly via
window replay."""

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerial_mapper_tpu.camera import Camera
from aerial_mapper_tpu.camera.rig import CameraRig
from aerial_mapper_tpu.config import (
    BlockMatchingConfig,
    DsmConfig,
    GridMapConfig,
    PipelineConfig,
)
from aerial_mapper_tpu.geo.se3 import matrix_to_quat
from aerial_mapper_tpu.pipeline.dataset import Dataset
from aerial_mapper_tpu.pipeline.incremental import run_incremental
from aerial_mapper_tpu.synth import (
    SyntheticScene,
    make_survey_poses,
    render_image,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

_LAYER_KEYS = ("elevation", "ortho", "elevation_angle",
               "observation_index", "num_observations")


@pytest.fixture(scope="module")
def survey_dataset():
    """North-flying survey whose footprints outspan single row bands (the
    dryrun geometry): every post-slab cull produces strictly smaller
    per-band subsets on the (1, 8) mesh."""
    cam = Camera(fx=96.0, fy=96.0, cx=48.0, cy=24.0, width=96, height=48)
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=4.0)
    n = 9
    Rs, ts = make_survey_poses(n, altitude=454.0, spacing=3.0,
                               num_lines=n, line_spacing=3.0)
    images = [
        np.asarray(render_image(scene, cam, jnp.asarray(R, jnp.float32),
                                jnp.asarray(t, jnp.float32)))
        for R, t in zip(Rs, ts)
    ]
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)),
                       np.float64)
    rig = CameraRig(cameras=(cam,), T_C_B_quats=np.array([[1.0, 0, 0, 0]]),
                    T_C_B_trans=np.zeros((1, 3)))
    return Dataset(rig=rig, quats_G_B=quats, trans_G_B=np.asarray(ts),
                   images=images)


def _cfg():
    return PipelineConfig(
        grid=GridMapConfig(center_easting=0.0, center_northing=12.0,
                           delta_easting=48.0, delta_northing=96.0,
                           resolution=1.0),
        bm=BlockMatchingConfig(num_disparities=32),
        dsm=DsmConfig(interpolation_radius_sq=2.0),
    )


def _assert_identical(a_layers, b_layers):
    for k in _LAYER_KEYS:
        a, b = np.asarray(a_layers[k]), np.asarray(b_layers[k])
        np.testing.assert_array_equal(
            np.where(np.isnan(a), -1.0, a), np.where(np.isnan(b), -1.0, b),
            err_msg=k,
        )


def _single_device(dataset):
    layers, _ = run_incremental(
        dataset, dataclasses.replace(_cfg(), auto_shard=False),
        update_every_nth=2,
    )
    return layers


def test_culled_incremental_bit_identical_and_reduces(
        survey_dataset, monkeypatch):
    """The flagship claim: with the slab-tracked cull active, per-band
    image subsets are strictly smaller than the full subset AND the final
    map is bit-identical to the single-device driver."""
    from aerial_mapper_tpu.parallel import sharded as sh

    calls = []
    real = sh.band_image_operands

    def recording(geom, n_tiles, quats, ts, images, cam, **kw):
        banded = real(geom, n_tiles, quats, ts, images, cam, **kw)
        calls.append((np.asarray(banded.ids), np.asarray(ts).shape[0]))
        return banded

    monkeypatch.setattr(sh, "band_image_operands", recording)

    steps = []
    layers, _ = run_incremental(
        survey_dataset, _cfg(), update_every_nth=2, check_every=2,
        on_update=lambda i, ls, g: steps.append(i),
    )
    # window 1 (updates 1, 3) ran replicated (no slab yet); windows after
    # the first validation are culled
    assert len(calls) >= 2
    for ids, m in calls:
        members = (ids >= 0).sum(axis=1)
        assert ids.shape[0] == 8
        # total band membership strictly below broadcasting the full
        # m-image subset to all 8 bands, with whole bands reduced (a band
        # holding both of a consecutive pair's overlapping footprints is
        # expected, so members.max() == m is legitimate)
        assert (ids >= 0).sum() < 8 * m, "cull produced full replication"
        assert members.min() < m
    assert steps == [1, 3, 5, 7]  # deferred callbacks flushed in order

    _assert_identical(layers, _single_device(survey_dataset))


def test_slab_violation_replays_exactly(survey_dataset, caplog):
    """An adversarial NEGATIVE slab margin guarantees every culled window
    measures an elevation range escaping its slab: the driver must detect
    it, replay the window with replicated images, and still produce the
    bit-identical map."""
    with caplog.at_level(logging.WARNING, logger="aerial_mapper_tpu"):
        layers, _ = run_incremental(
            survey_dataset, _cfg(), update_every_nth=2, check_every=2,
            slab_margin_m=-0.5,
        )
    assert any("replaying" in r.message for r in caplog.records), \
        "violation path never triggered"
    _assert_identical(layers, _single_device(survey_dataset))


def test_overflow_recovery_bit_identical(survey_dataset, caplog):
    """A deliberately tiny routing capacity must overflow, and the driver
    must recover by replaying the window with doubled capacity until the
    routing is lossless — final map bit-identical (VERDICT r3 #4)."""
    with caplog.at_level(logging.WARNING, logger="aerial_mapper_tpu"):
        layers, _ = run_incremental(
            survey_dataset, _cfg(), update_every_nth=2, check_every=2,
            route_capacity_factor=0.2,
        )
    msgs = [r.message for r in caplog.records]
    assert any("overflow" in m for m in msgs), "overflow path not hit"
    _assert_identical(layers, _single_device(survey_dataset))


def test_z_filter_applies_identically_everywhere(survey_dataset):
    """StereoConfig.z_min/z_max (opt-in outlier bound, the reference's
    loaded-cloud z-filter extended to generated clouds) must act
    IDENTICALLY in the single-device and fused sharded drivers, and
    actually constrain the DSM."""
    cfg = dataclasses.replace(
        _cfg(),
        stereo=dataclasses.replace(_cfg().stereo, z_min=405.0, z_max=425.0),
    )
    l_sh, _ = run_incremental(survey_dataset, cfg, update_every_nth=2,
                              check_every=2)
    l_1, _ = run_incremental(
        survey_dataset, dataclasses.replace(cfg, auto_shard=False),
        update_every_nth=2)
    _assert_identical(l_sh, l_1)
    elev = np.asarray(l_1["elevation"])
    fin = np.isfinite(elev)
    assert fin.any()
    assert elev[fin].min() >= 405.0 and elev[fin].max() <= 425.0


def test_flat_plane_cull_bit_identical(survey_dataset, monkeypatch):
    """use_digital_elevation_map=False (flat-plane ortho): the cull slab
    is the plane constant, exact from update 1, never validated against
    the (irrelevant) DSM range — sharded result bit-identical to
    single-device with the cull ACTIVE (round-4 review: the DSM-derived
    slab could silently drop images that texture the plane)."""
    from aerial_mapper_tpu.config import OrthoBackwardGridConfig
    from aerial_mapper_tpu.parallel import sharded as sh

    cfg = dataclasses.replace(
        _cfg(),
        ortho_backward=OrthoBackwardGridConfig(
            use_digital_elevation_map=False,
            orthomosaic_elevation_m=414.0, cell_chunk=4096,
        ),
    )
    calls = []
    real = sh.band_image_operands

    def recording(*a, **kw):
        calls.append(kw.get("elev_min"))
        return real(*a, **kw)

    monkeypatch.setattr(sh, "band_image_operands", recording)
    l_sh, _ = run_incremental(survey_dataset, cfg, update_every_nth=2,
                              check_every=2)
    l_1, _ = run_incremental(
        survey_dataset, dataclasses.replace(cfg, auto_shard=False),
        update_every_nth=2)
    # the cull ran from the FIRST update with the plane-constant slab
    assert len(calls) == 4
    assert all(abs(c - 413.999) < 1e-2 for c in calls)
    _assert_identical(l_sh, l_1)


def test_halo_wider_than_band_rejected():
    """A max IDW radius whose window halfwidth exceeds the per-tile band
    height must be rejected statically (halo strips only span immediate
    neighbors; accepting it would silently drop contributions)."""
    from aerial_mapper_tpu.config import (
        DsmConfig,
        OrthoBackwardGridConfig,
    )
    from aerial_mapper_tpu.mapgrid.grid import MapGeometry, create_map_state
    from aerial_mapper_tpu.parallel import make_mesh
    from aerial_mapper_tpu.parallel.sharded import (
        pad_ring_pairs,
        prepare_ring_pair_operands,
        replicated_band_images,
        sharded_map_step,
    )
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat

    mesh = make_mesh(("pairs", "tiles"), shape=(1, 8))
    geom = MapGeometry(center_easting=0.0, center_northing=0.0,
                       resolution=1.0, height=16, width=32)  # band_h = 2
    cam = Camera(fx=32.0, fy=32.0, cx=16.0, cy=12.0, width=32, height=24)
    Rs, ts = make_survey_poses(9, altitude=454.0, spacing=2.0)
    images = [np.zeros((24, 32), np.float32) for _ in Rs]
    ring = pad_ring_pairs(
        prepare_ring_pair_operands(cam.K, Rs, ts, images), 8)
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    banded = replicated_band_images(quats, np.asarray(ts),
                                    jnp.stack(images))
    layers = dict(create_map_state(geom).layers)
    # adaptive max_radius_sq=49 m^2 -> halo 8 rows > band_h 2
    dsm_cfg = DsmConfig(interpolation_radius_sq=2.0, max_radius_sq=49.0)
    with pytest.raises(ValueError, match="halo"):
        sharded_map_step(
            layers, ring, banded, geom, cam, dsm_cfg,
            OrthoBackwardGridConfig(cell_chunk=256), mesh,
        )


def test_deferred_on_update_payloads_host_resident_and_exact(
        survey_dataset):
    """VERDICT r4 #6: deferred on_update payloads in the sharded driver
    are staged to HOST numpy as they are recorded (O(1) device layer sets
    regardless of check_every), and each payload equals the single-device
    driver's state after the same update."""
    sharded_payloads = {}
    layers, _ = run_incremental(
        survey_dataset, _cfg(), update_every_nth=2, check_every=4,
        on_update=lambda i, ls, g: sharded_payloads.update({i: ls}),
    )
    assert sorted(sharded_payloads) == [1, 3, 5, 7]
    for i, ls in sharded_payloads.items():
        for k in _LAYER_KEYS:
            assert isinstance(ls[k], np.ndarray), (
                f"payload layer {k} at update {i} is "
                f"{type(ls[k]).__name__}, expected host numpy"
            )
    single_payloads = {}
    run_incremental(
        survey_dataset, dataclasses.replace(_cfg(), auto_shard=False),
        update_every_nth=2,
        on_update=lambda i, ls, g: single_payloads.update(
            {i: {k: np.asarray(v) for k, v in ls.items()}}),
    )
    for i in sharded_payloads:
        _assert_identical(sharded_payloads[i], single_payloads[i])
