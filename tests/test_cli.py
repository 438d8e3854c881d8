"""Smoke tests for the demo CLIs on a generated synthetic dataset.

One test per reference demo binary (aerial_mapper_demos/src/: dense-pcl,
dsm, ortho x4, pix4d-geofile, google-maps) plus the framework's extra CLIs
(refine-poses, convert-simulation; make-synthetic-dataset is the fixture).
Tiny shapes keep CPU compile time bounded; assertions check that each CLI
writes its artifacts and that rasters carry sane values.
"""

import os

import numpy as np
import pytest

from aerial_mapper_tpu.cli import (
    main_dense_pcl,
    main_dsm,
    main_make_synthetic_dataset,
    main_ortho_backward_grid,
    main_ortho_backward_grid_incremental,
    main_ortho_forward_homography,
    main_ortho_from_pcl,
)
from aerial_mapper_tpu.io.geotiff import read_geotiff
from aerial_mapper_tpu.io.images import load_images_by_names


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_ds"))
    main_make_synthetic_dataset.main([
        "--output_directory", d, "--num_images", "6",
        "--image_width", "96", "--image_height", "64",
        "--focal_length", "96", "--altitude", "454", "--spacing", "5",
    ])
    return d


GRID = ["--center_easting", "12", "--center_northing", "0",
        "--delta_easting", "30", "--delta_northing", "24",
        "--resolution", "1.0"]
STEREO = ["--dense_pcl_use_every_nth_image", "1", "--num_disparities", "16"]


def test_cli_dense_pcl(dataset_dir):
    out = os.path.join(dataset_dir, "pcl.txt")
    main_dense_pcl.main(["--data_directory", dataset_dir] + STEREO
                        + ["--output_cloud_txt", out])
    cloud = np.loadtxt(out)
    assert cloud.shape[1] == 4 and len(cloud) > 1000
    # triangulated heights near the synthetic ground (414 m +- relief)
    assert 400 < np.median(cloud[:, 2]) < 430


def test_cli_dsm(dataset_dir):
    tif = os.path.join(dataset_dir, "dsm.tif")
    color_tif = os.path.join(dataset_dir, "dsm_color.tif")
    main_dsm.main(["--data_directory", dataset_dir] + GRID + STEREO
                  + ["--output_geotiff", tif,
                     "--output_color_geotiff", color_tif])
    band, _geo, _epsg = read_geotiff(tif)
    assert band.shape == (24, 30)
    covered = np.isfinite(band)
    assert covered.mean() > 0.3
    assert 400 < np.median(band[covered]) < 430
    # palette DEM export (writeDataToDEMGeoTiffColor parity)
    rgb, _geo2, epsg2 = read_geotiff(color_tif)
    assert rgb.shape == (24, 30, 3) and epsg2 == 32632


def test_cli_ortho_backward_grid(dataset_dir):
    tif = os.path.join(dataset_dir, "ortho.tif")
    jpg = os.path.join(dataset_dir, "ortho.jpg")
    report = os.path.join(dataset_dir, "ortho_report.html")
    main_ortho_backward_grid.main(
        ["--data_directory", dataset_dir] + GRID + STEREO
        + ["--output_geotiff", tif, "--orthomosaic_jpg_filename", jpg,
           "--report_html", report])
    band, _geo, _epsg = read_geotiff(tif)
    textured = band != 255.0
    assert textured.mean() > 0.3
    assert os.path.exists(jpg)
    with open(report) as f:
        page = f.read()
    # self-contained page: embedded layer PNGs, stats, timings, config
    assert page.count("data:image/png;base64,") >= 3
    for needle in ("ortho", "elevation", "Stage timings", "Configuration",
                   "Layer statistics"):
        assert needle in page, needle


def test_cli_ortho_backward_grid_incremental(dataset_dir):
    jpg = os.path.join(dataset_dir, "ortho_inc.jpg")
    # incremental pairs span update_every_nth frames -> 2x the baseline of
    # the consecutive-frame tests, so the disparity range must double too
    # delta_northing 32: on the 8-tile mesh the default adaptive IDW halo
    # (4 rows) must fit one band (sharded.py _check_halo_fits_band)
    main_ortho_backward_grid_incremental.main(
        ["--data_directory", dataset_dir] + GRID
        + ["--delta_northing", "32",
           "--dense_pcl_use_every_nth_image", "1", "--num_disparities", "32",
           "--update_every_nth", "2", "--orthomosaic_jpg_filename", jpg])
    img = load_images_by_names(os.path.dirname(jpg), [os.path.basename(jpg)])[0]
    assert (img != 255).mean() > 0.2


def test_cli_dsm_refine_poses_recovers_accuracy(tmp_path, rng):
    """VERDICT r2 #3 at the CLI level: --refine_poses runs feature-track BA
    before rasterization, recovering most of the DSM accuracy lost to a
    noisy pose prior (sigma = 0.5 m). Uses its own dataset: the shared
    96x64 fixture is too small for well-conditioned BA."""
    from aerial_mapper_tpu.io.poses import load_poses, save_poses_standard
    from aerial_mapper_tpu.synth import SyntheticScene

    d = str(tmp_path / "refine_ds")
    main_make_synthetic_dataset.main([
        "--output_directory", d, "--num_images", "10",
        "--image_width", "320", "--image_height", "240",
        "--focal_length", "320", "--altitude", "514", "--spacing", "6",
        "--relief_amplitude", "5",
    ])
    quats, trans, _ = load_poses(os.path.join(d, "opt_poses.txt"))
    noisy = trans.copy()
    noisy[1:] += rng.normal(scale=0.5, size=(len(trans) - 1, 3))
    save_poses_standard(os.path.join(d, "noisy_poses.txt"), quats, noisy)

    grid = ["--center_easting", "30", "--center_northing", "0",
            "--delta_easting", "60", "--delta_northing", "50",
            "--resolution", "0.5"]
    stereo = ["--dense_pcl_use_every_nth_image", "1",
              "--num_disparities", "48"]

    def dsm_rmse(extra):
        tif = os.path.join(d, f"dsm_rp_{len(extra)}.tif")
        main_dsm.main(
            ["--data_directory", d, "--filename_poses", "noisy_poses.txt"]
            + grid + stereo + ["--output_geotiff", tif] + extra)
        band, geo, _ = read_geotiff(tif)
        west, north, res = geo
        h, w = band.shape
        ce = west + (np.arange(w) + 0.5) * res
        cn = north - (np.arange(h) + 0.5) * res
        truth = np.asarray(SyntheticScene(
            base_elevation=414.0, relief_amplitude=5.0
        ).height(ce[None, :].repeat(h, 0), cn[:, None].repeat(w, 1)))
        cov = np.isfinite(band)
        assert cov.mean() > 0.2
        return float(np.sqrt(np.mean((band[cov] - truth[cov]) ** 2)))

    rmse_noisy = dsm_rmse([])
    rmse_refined = dsm_rmse(["--refine_poses"])
    # >= 2x recovery (measured ~25x on an independent noise draw)
    assert rmse_refined < rmse_noisy * 0.5, \
        f"{rmse_noisy:.2f} -> {rmse_refined:.2f}"
    assert rmse_refined < 2.0


def test_cli_incremental_sharded_matches_single_device(dataset_dir):
    """VERDICT r2 #2: the incremental CLI on the 8-device virtual mesh
    (fused sharded_map_step per update, pair + map-height padding built
    in) is BIT-identical to the forced single-device run. The 26-row map
    does not divide by 8 tiles, so pad_map_geometry is on the hot path;
    the 1-pair updates exercise pad_ring_pairs (1 -> 8 slots)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from aerial_mapper_tpu.io.artifacts import load_layers

    grid = ["--center_easting", "12", "--center_northing", "0",
            "--delta_easting", "30", "--delta_northing", "26",
            "--resolution", "1.0"]
    common_args = (["--data_directory", dataset_dir] + grid
                   + ["--dense_pcl_use_every_nth_image", "1",
                      "--num_disparities", "32", "--update_every_nth", "2"])
    npz_sharded = os.path.join(dataset_dir, "inc_sharded.npz")
    npz_single = os.path.join(dataset_dir, "inc_single.npz")
    preview = os.path.join(dataset_dir, "inc_preview")
    main_ortho_backward_grid_incremental.main(
        common_args + ["--output_layers_npz", npz_sharded,
                       "--preview_every_updates", "2",
                       "--preview_dir", preview])
    main_ortho_backward_grid_incremental.main(
        common_args + ["--no-auto_shard", "--output_layers_npz", npz_single])

    sharded, geom_s = load_layers(npz_sharded)
    single, geom_1 = load_layers(npz_single)
    assert geom_s.height == 26 and geom_1.height == 26
    for key in ("elevation", "ortho", "elevation_angle",
                "observation_index", "num_observations"):
        a, b = sharded[key], single[key]
        np.testing.assert_array_equal(
            np.where(np.isnan(a), -1.0, a), np.where(np.isnan(b), -1.0, b),
            err_msg=key,
        )
    assert np.isfinite(sharded["elevation"]).mean() > 0.3
    # live observability (reference's 0.1 Hz publish analogue): the
    # periodic preview dump wrote its artifacts during the run
    for f in ("ortho_live.png", "elevation_live.png", "layers_live.npz"):
        assert os.path.exists(os.path.join(preview, f)), f


def test_cli_ortho_forward_homography(dataset_dir):
    jpg = os.path.join(dataset_dir, "mosaic.jpg")
    main_ortho_forward_homography.main(
        ["--data_directory", dataset_dir,
         "--ground_plane_elevation_m", "414",
         "--width_mosaic_pixels", "40", "--height_mosaic_pixels", "32",
         "--mosaic_origin", "-3", "12", "414",
         "--filename_mosaic_output", jpg])
    img = load_images_by_names(os.path.dirname(jpg), [os.path.basename(jpg)])[0]
    assert (img > 0).mean() > 0.3  # unobserved pixels are zeroed


def test_cli_ortho_from_pcl(dataset_dir):
    cloud = os.path.join(dataset_dir, "pcl.txt")
    if not os.path.exists(cloud):
        main_dense_pcl.main(["--data_directory", dataset_dir] + STEREO
                            + ["--output_cloud_txt", cloud])
    jpg = os.path.join(dataset_dir, "ortho_pcl.jpg")
    main_ortho_from_pcl.main(
        ["--data_directory", dataset_dir] + GRID
        + ["--point_cloud_filename", cloud,
           "--orthomosaic_jpg_filename", jpg])
    img = load_images_by_names(os.path.dirname(jpg), [os.path.basename(jpg)])[0]
    assert img.std() > 1.0  # carries texture, not a constant fill


def test_cli_generate_pix4d_geofile(dataset_dir, tmp_path):
    from aerial_mapper_tpu.cli import main_generate_pix4d_geofile

    out = str(tmp_path / "pix4d")
    main_generate_pix4d_geofile.main(
        ["--data_directory", dataset_dir,
         "--output_directory", out,
         "--georeference_every_nth_image", "2"])
    lines = open(os.path.join(out, "geofile.txt")).read().splitlines()
    assert len(lines) == 3  # images 2, 4, 6 of 6
    name, x, y, z = lines[0].split()
    assert name.endswith(".jpeg") and os.path.exists(os.path.join(out, name))
    assert 440 < float(z) < 470  # camera altitude ~454


def test_cli_refine_poses(dataset_dir, tmp_path):
    from aerial_mapper_tpu.cli import main_refine_poses
    from aerial_mapper_tpu.io.poses import PoseFormat, load_poses

    out = str(tmp_path / "refined_poses.txt")
    main_refine_poses.main(
        ["--data_directory", dataset_dir, "--output_poses", out,
         "--num_corners", "64", "--ba_iterations", "3"])
    quats, trans, _ = load_poses(out, PoseFormat.STANDARD)
    assert len(trans) == 6
    # noiseless input: refinement must stay near the true trajectory
    assert abs(float(trans[0][2]) - 454.0) < 1.0


def test_cli_convert_simulation(tmp_path):
    from aerial_mapper_tpu.cli import main_convert_simulation
    from aerial_mapper_tpu.io.images import save_image
    from aerial_mapper_tpu.io.poses import PoseFormat, load_poses

    sim = tmp_path / "sim"
    (sim / "cam0").mkdir(parents=True)
    # ROS-csv poses: t x y z qx qy qz qw; image ids map to t-1 via offset
    with open(sim / "vi_imu_poses.csv", "w") as f:
        for t in range(100, 106):
            f.write(f"{t}, {t * 1.0}, 0.0, 454.0, 0.0, 0.0, 0.0, 1.0\n")
    with open(sim / "blender_id_time.csv", "w") as f:
        for i, t in enumerate(range(101, 107)):  # offset -1 -> pose t-1
            f.write(f"{i}, {t}\n")
    for t in range(101, 107):
        save_image(str(sim / "cam0" / f"{t}.png"),
                   np.full((8, 12), 128.0, np.float32))

    out = tmp_path / "converted"
    main_convert_simulation.main(
        ["--input_directory", str(sim), "--output_directory", str(out),
         "--timestamp_offset", "-1"])
    quats, trans, _ = load_poses(str(out / "opt_poses.txt"),
                                 PoseFormat.STANDARD)
    assert len(trans) == 6
    assert abs(float(trans[0][0]) - 100.0) < 1e-6
    assert os.path.exists(out / "image_5.jpg")


def test_cli_google_maps_offline(tmp_path):
    from aerial_mapper_tpu.cli import main_google_maps

    # zero-egress: must not crash, reports the URL and exits cleanly
    main_google_maps.main(
        ["--center_easting", "465000", "--center_northing", "5272000",
         "--utm_zone", "32",
         "--output", str(tmp_path / "tile.png")])


def test_cli_reference_flagfile_compatibility(dataset_dir, tmp_path):
    """The reference's .ff files translate verbatim: gflags booleans
    (--alsologtostderr=true), --flagfile indirection, shared flag names
    (flags/0-synthetic-cadastre-dsm.ff layout)."""
    ff = tmp_path / "cadastre-dsm.ff"
    ff.write_text(
        "--alsologtostderr=true\n"
        "--v=0\n"
        f"--data_directory={dataset_dir}\n"
        "--filename_camera_rig=camera_fixed_wing.yaml\n"
        "--filename_poses=opt_poses.txt\n"
        "--prefix_images=image_\n"
        "--center_easting=12.0\n"
        "--center_northing=0.0\n"
        "--delta_easting=30.0\n"
        "--delta_northing=24.0\n"
        "--resolution=1.0\n"
    )
    tif = str(tmp_path / "dsm_ff.tif")
    main_dsm.main([f"--flagfile={ff}",
                   "--dense_pcl_use_every_nth_image", "1",
                   "--num_disparities", "16",
                   "--output_geotiff", tif])
    band, _geo, _epsg = read_geotiff(tif)
    assert band.shape == (24, 30)
    assert np.isfinite(band).mean() > 0.3


def test_cli_rafz_homography_flagfile_compatibility(dataset_dir, tmp_path):
    """The rafz demo's prefixed flags (forward_homography_*) and split
    mosaic-origin flags translate verbatim
    (flags/1-real-rafz-ortho-from-homography.ff layout)."""
    ff = tmp_path / "rafz.ff"
    ff.write_text(
        "--alsologtostderr=true\n"
        "--v=0\n"
        f"--forward_homography_data_directory={dataset_dir}\n"
        "--forward_homography_filename_poses=opt_poses.txt\n"
        "--forward_homography_prefix_images=image_\n"
        "--forward_homography_filename_camera_rig=camera_fixed_wing.yaml\n"
        "--forward_homography_origin_easting_m=-3.0\n"
        "--forward_homography_origin_northing_m=12.0\n"
        "--forward_homography_origin_elevation_m=414.0\n"
    )
    jpg = str(tmp_path / "rafz_mosaic.jpg")
    main_ortho_forward_homography.main(
        [f"--flagfile={ff}",
         "--ground_plane_elevation_m", "414",
         "--width_mosaic_pixels", "40", "--height_mosaic_pixels", "32",
         "--filename_mosaic_output", jpg])
    img = load_images_by_names(os.path.dirname(jpg),
                               [os.path.basename(jpg)])[0]
    assert (img > 0).mean() > 0.3


def test_cli_colored_ortho_end_to_end(tmp_path):
    """Colored dataset -> colored backward-grid ortho: the exported RGB
    must match the scene's analytic texture_rgb at the cell centers."""
    import jax.numpy as jnp

    from aerial_mapper_tpu.synth.scene import SyntheticScene
    from aerial_mapper_tpu.mapgrid import MapGeometry, cell_centers

    d = str(tmp_path / "color_ds")
    main_make_synthetic_dataset.main([
        "--output_directory", d, "--num_images", "6",
        "--image_width", "96", "--image_height", "64",
        "--focal_length", "96", "--altitude", "454", "--spacing", "5",
        "--color",
    ])
    tif = str(tmp_path / "ortho_color.tif")
    main_ortho_backward_grid.main(
        ["--data_directory", d, "--load_colored_images",
         "--colored_ortho"] + GRID + STEREO
        + ["--output_geotiff", tif])
    rgb, _geo, _epsg = read_geotiff(tif)
    assert rgb.ndim == 3 and rgb.shape[2] == 3
    geom = MapGeometry(12.0, 0.0, 1.0, 24, 30)
    ce, cn = cell_centers(geom)
    truth = np.asarray(
        SyntheticScene(base_elevation=414.0,
                       relief_amplitude=6.0).texture_rgb(ce, cn)
    )
    # unobserved cells export as white (the grayscale path's 255 fill)
    observed = ~np.all(rgb == 255, axis=2)
    assert observed.mean() > 0.3
    err = np.abs(rgb[observed].astype(np.float32) - truth[observed])
    # JPEG compression of the input images + nearest-texel fetch
    assert np.median(err) < 12.0, np.median(err)


def test_cli_incremental_resume_equals_one_run(dataset_dir):
    """Checkpoint/resume at the driver level: mapping frames 0..3, saving,
    then resuming from frame 4 onto the saved map must equal the
    uninterrupted 6-frame run EXACTLY — the saved layers equal the full
    run's state at the checkpoint, and --start_frame reconstructs the
    previous-frame pairing chain from the update boundary."""
    from aerial_mapper_tpu.io.artifacts import load_layers

    grid = ["--center_easting", "12", "--center_northing", "0",
            "--delta_easting", "30", "--delta_northing", "32",
            "--resolution", "1.0"]  # 32 rows: halo fits the 8-tile bands
    stereo = ["--dense_pcl_use_every_nth_image", "1",
              "--num_disparities", "32", "--update_every_nth", "2"]
    full_npz = os.path.join(dataset_dir, "inc_full_run.npz")
    part_npz = os.path.join(dataset_dir, "inc_part_run.npz")
    resumed_npz = os.path.join(dataset_dir, "inc_resumed_run.npz")

    main_ortho_backward_grid_incremental.main(
        ["--data_directory", dataset_dir] + grid + stereo
        + ["--output_layers_npz", full_npz])
    main_ortho_backward_grid_incremental.main(
        ["--data_directory", dataset_dir, "--max_frames", "4"] + grid
        + stereo + ["--output_layers_npz", part_npz])
    main_ortho_backward_grid_incremental.main(
        ["--data_directory", dataset_dir] + grid + stereo
        + ["--resume_layers_npz", part_npz, "--start_frame", "4",
           "--output_layers_npz", resumed_npz])

    full, _ = load_layers(full_npz)
    resumed, _ = load_layers(resumed_npz)
    for k in ("elevation", "ortho", "elevation_angle",
              "observation_index", "num_observations"):
        a, b = resumed[k], full[k]
        np.testing.assert_array_equal(
            np.where(np.isnan(a), -1.0, a), np.where(np.isnan(b), -1.0, b),
            err_msg=k,
        )


def test_incremental_sharded_colored_ortho(tmp_path):
    """Colored incremental mapping through the fused sharded step: RGB
    subset images ride the replicated band layout (regression: the
    replicated-vs-banded discrimination must key on ids rank, not image
    rank — [M, H, W, 3] replicated color has the same rank as banded
    gray) and the colored_ortho layer stays bit-identical to the
    single-device run."""
    import dataclasses

    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from aerial_mapper_tpu.config import (
        BlockMatchingConfig,
        DsmConfig,
        GridMapConfig,
        OrthoBackwardGridConfig,
        PipelineConfig,
        StereoConfig,
    )
    from aerial_mapper_tpu.pipeline.dataset import load_dataset
    from aerial_mapper_tpu.pipeline.incremental import run_incremental

    d = str(tmp_path / "color_inc_ds")
    main_make_synthetic_dataset.main([
        "--output_directory", d, "--num_images", "6",
        "--image_width", "96", "--image_height", "64",
        "--focal_length", "96", "--altitude", "454", "--spacing", "5",
        "--color",
    ])
    rig = ("camera_rig.yaml"
           if os.path.exists(os.path.join(d, "camera_rig.yaml"))
           else "camera_fixed_wing.yaml")
    ds = load_dataset(d, rig, "opt_poses.txt", "image_", color=True)
    cfg = PipelineConfig(
        grid=GridMapConfig(center_easting=12, center_northing=0,
                           delta_easting=30, delta_northing=26,
                           resolution=1.0),
        stereo=StereoConfig(use_every_nth_image=1),
        bm=BlockMatchingConfig(num_disparities=32),
        dsm=DsmConfig(interpolation_radius_sq=2.0),
        ortho_backward=OrthoBackwardGridConfig(colored_ortho=True),
    )
    l_sh, _ = run_incremental(ds, cfg, update_every_nth=2)
    l_1, _ = run_incremental(
        ds, dataclasses.replace(cfg, auto_shard=False), update_every_nth=2
    )
    for k in ("elevation", "colored_ortho", "elevation_angle",
              "observation_index"):
        a, b = np.asarray(l_sh[k]), np.asarray(l_1[k])
        np.testing.assert_array_equal(
            np.where(np.isnan(a), -1.0, a), np.where(np.isnan(b), -1.0, b),
            err_msg=k,
        )
    assert np.isfinite(np.asarray(l_sh["colored_ortho"])).mean() > 0.2


def test_gflags_false_negates_default_true_flag(dataset_dir, tmp_path):
    """--flag=false must actually disable default-true booleans (gflags
    semantics), e.g. select SGM via --use_BM=false."""
    from aerial_mapper_tpu.cli import common

    p = common.base_parser("t")
    common.add_stereo_flags(p)
    common.add_dsm_flags(p)
    args = p.parse_args(common.expand_flagfiles(
        ["--data_directory", dataset_dir, "--use_BM=false",
         "--adaptive_interpolation=false"]))
    assert args.use_BM is False
    assert args.adaptive_interpolation is False
    # values merely containing the literals are untouched
    args2 = p.parse_args(common.expand_flagfiles(
        ["--data_directory", "/tmp/x=false", "--prefix_images", "a=true"]))
    assert args2.data_directory == "/tmp/x=false"
    assert args2.prefix_images == "a=true"


def test_kernel_family_flag_reaches_every_stage():
    """--kernel_family pallas selects the fused kernels in EVERY stage
    config (VERDICT r3 #2: a CLI flag must reach
    block_matching_disparity_pallas)."""
    from aerial_mapper_tpu.cli import common

    p = common.base_parser("t")
    common.add_grid_flags(p)
    common.add_stereo_flags(p)
    common.add_dsm_flags(p)
    args = p.parse_args(["--data_directory", "/nonexistent",
                         "--kernel_family", "pallas"])
    cfg = common.pipeline_config_from_args(args)
    assert cfg.bm.kernel == "pallas"
    assert cfg.sgm.kernel == "pallas"
    assert cfg.dsm.idw_kernel == "pallas"
    assert cfg.ortho_backward.score_kernel == "pallas"
    # default stays the measured XLA family
    args = p.parse_args(["--data_directory", "/nonexistent"])
    cfg = common.pipeline_config_from_args(args)
    assert (cfg.bm.kernel, cfg.sgm.kernel, cfg.dsm.idw_kernel,
            cfg.ortho_backward.score_kernel) == ("xla",) * 4


def test_cli_dsm_plane_sweep_densifier(dataset_dir):
    """--densifier plane_sweep drives the DSM CLI end-to-end: the N-view
    elevation sweep replaces pair stereo and still lands within a cell of
    the synthetic terrain."""
    from aerial_mapper_tpu import synth

    tif = os.path.join(dataset_dir, "dsm_ps.tif")
    main_dsm.main([
        "--data_directory", dataset_dir, "--prefix_images", "image_",
    ] + GRID + [
        "--dense_pcl_use_every_nth_image", "1",
        "--densifier", "plane_sweep",
        "--ps_z_min", "399", "--ps_z_max", "429",
        "--ps_num_planes", "31", "--ps_max_cost", "8.0",
        "--interpolation_radius", "2.0",
        "--output_geotiff", tif,
    ])
    data, _geo, _epsg = read_geotiff(tif)
    fin = np.isfinite(data)
    assert fin.mean() > 0.8
    assert 405 < np.nanmedian(data) < 425


def test_reference_backward_grid_flagfiles_run(dataset_dir, tmp_path):
    """The reference's OWN backward-grid flagfiles (batch + incremental,
    with their --backward_grid_ prefixes, gflags =true/=false booleans,
    and visualization/threading toggles) must parse and run verbatim —
    only the dataset/geometry flags are overridden after the flagfile
    (argparse last-wins), exactly how a migrating user would invoke it
    (round-4 review: =false flags expanded to --no-<prefixed> BEFORE the
    prefix strip and aborted)."""
    import shutil

    ref = ("/root/reference/aerial_mapper_demos/flags/"
           "0-synthetic-cadastre-ortho-backward-batch.ff")
    ff = str(tmp_path / "batch.ff")
    shutil.copy(ref, ff)
    jpg = str(tmp_path / "ref_ff_ortho.jpg")
    main_ortho_backward_grid.main([
        f"--flagfile={ff}",
        "--data_directory", dataset_dir, "--prefix_images", "image_",
        "--filename_camera_rig", "camera_fixed_wing.yaml",
        "--center_easting", "12", "--center_northing", "0",
        "--delta_easting", "30", "--delta_northing", "24",
        "--resolution", "1.0",
        "--dense_pcl_use_every_nth_image", "1",
        "--num_disparities", "16",
        "--orthomosaic_elevation_m", "414.0",
        "--orthomosaic_jpg_filename", jpg,
        "--output_geotiff", str(tmp_path / "ref_ff.tif"),
    ])
    assert os.path.exists(jpg)

    ref_inc = ("/root/reference/aerial_mapper_demos/flags/"
               "0-synthetic-cadastre-ortho-backward-incremental.ff")
    ff2 = str(tmp_path / "inc.ff")
    shutil.copy(ref_inc, ff2)
    jpg2 = str(tmp_path / "ref_ff_inc.jpg")
    main_ortho_backward_grid_incremental.main([
        f"--flagfile={ff2}",
        "--data_directory", dataset_dir, "--prefix_images", "image_",
        "--filename_camera_rig", "camera_fixed_wing.yaml",
        "--center_easting", "12", "--center_northing", "0",
        "--delta_easting", "30", "--delta_northing", "32",
        "--resolution", "1.0",
        "--dense_pcl_use_every_nth_image", "1",
        "--num_disparities", "32", "--update_every_nth", "2",
        "--orthomosaic_elevation_m", "414.0",
        "--orthomosaic_jpg_filename", jpg2,
    ])
    assert os.path.exists(jpg2)


def test_reference_ortho_from_pcl_flagfile_runs(dataset_dir, tmp_path):
    """The reference's ortho-from-pcl flagfile (--ortho_from_pcl_ prefix,
    =false booleans) parses and runs verbatim with dataset overrides."""
    import shutil

    ref = ("/root/reference/aerial_mapper_demos/flags/"
           "0-synthetic-cadastre-ortho-from-pcl.ff")
    ff = str(tmp_path / "pcl.ff")
    shutil.copy(ref, ff)
    jpg = str(tmp_path / "ref_ff_pcl.jpg")
    main_ortho_from_pcl.main([
        f"--flagfile={ff}",
        "--data_directory", dataset_dir, "--prefix_images", "image_",
        "--filename_camera_rig", "camera_fixed_wing.yaml",
        "--center_easting", "12", "--center_northing", "0",
        "--delta_easting", "30", "--delta_northing", "24",
        "--resolution", "1.0",
        "--dense_pcl_use_every_nth_image", "1",
        "--num_disparities", "16",
        "--orthomosaic_jpg_filename", jpg,
    ])
    assert os.path.exists(jpg)


def test_use_sgm_false_gflags_spelling():
    """--use_SGM=false (the natural gflags way to select BM) must parse:
    it expands to --no-use_SGM, which maps back to use_BM=True."""
    from aerial_mapper_tpu.cli import common

    p = common.base_parser("t")
    common.add_stereo_flags(p)
    argv = common.expand_flagfiles(
        ["--data_directory", "/x", "--use_SGM=false"])
    args = p.parse_args(argv)
    assert args.use_BM is True
    argv = common.expand_flagfiles(
        ["--data_directory", "/x", "--use_SGM=true"])
    args = p.parse_args(argv)
    assert args.use_BM is False
