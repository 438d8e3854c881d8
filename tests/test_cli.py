"""Smoke tests for the demo CLIs on a generated synthetic dataset.

One test per reference demo binary (aerial_mapper_demos/src/: dense-pcl,
dsm, ortho x4 — google-maps and pix4d-geofile are covered by their unit
tests). Tiny shapes keep CPU compile time bounded; assertions check that
each CLI writes its artifacts and that rasters carry sane values.
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
    main_dsm.main(["--data_directory", dataset_dir] + GRID + STEREO
                  + ["--output_geotiff", tif])
    band, _geo, _epsg = read_geotiff(tif)
    assert band.shape == (24, 30)
    covered = np.isfinite(band)
    assert covered.mean() > 0.3
    assert 400 < np.median(band[covered]) < 430


def test_cli_ortho_backward_grid(dataset_dir):
    tif = os.path.join(dataset_dir, "ortho.tif")
    jpg = os.path.join(dataset_dir, "ortho.jpg")
    main_ortho_backward_grid.main(
        ["--data_directory", dataset_dir] + GRID + STEREO
        + ["--output_geotiff", tif, "--orthomosaic_jpg_filename", jpg])
    band, _geo, _epsg = read_geotiff(tif)
    textured = band != 255.0
    assert textured.mean() > 0.3
    assert os.path.exists(jpg)


def test_cli_ortho_backward_grid_incremental(dataset_dir):
    jpg = os.path.join(dataset_dir, "ortho_inc.jpg")
    # incremental pairs span update_every_nth frames -> 2x the baseline of
    # the consecutive-frame tests, so the disparity range must double too
    main_ortho_backward_grid_incremental.main(
        ["--data_directory", dataset_dir] + GRID
        + ["--dense_pcl_use_every_nth_image", "1", "--num_disparities", "32",
           "--update_every_nth", "2", "--orthomosaic_jpg_filename", jpg])
    img = load_images_by_names(os.path.dirname(jpg), [os.path.basename(jpg)])[0]
    assert (img != 255).mean() > 0.2


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
