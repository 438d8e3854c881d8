"""Live preview HTTP server (io/preview_server.py) — the serving half of
the reference's rviz publish loop replacement (VERDICT r3 #9)."""

import os
import socket
import threading
import time
import urllib.error
import urllib.request

import numpy as np

from aerial_mapper_tpu.io.preview_server import (
    start_preview_server,
    stop_preview_server,
)


def _get(url, timeout=5.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, dict(r.headers), r.read()


def test_preview_server_serves_index_and_files(tmp_path):
    d = str(tmp_path / "preview")
    os.makedirs(d)
    from aerial_mapper_tpu.io.images import save_image

    save_image(os.path.join(d, "ortho_live.png"),
               np.full((8, 8), 128.0, np.float32))
    server = start_preview_server(d, port=0)
    port = server.server_address[1]
    try:
        status, headers, body = _get(f"http://localhost:{port}/")
        assert status == 200
        assert b"ortho_live.png" in body and b"elevation_live.png" in body
        status, headers, body = _get(
            f"http://localhost:{port}/ortho_live.png?12345")
        assert status == 200
        assert headers["Content-Type"] == "image/png"
        assert headers["Cache-Control"] == "no-store"
        assert body[:4] == b"\x89PNG"
        # missing file and traversal attempts -> 404
        for bad in ("/nope.png", "/../conftest.py", "/.hidden",
                    "/a%2f..%2fb"):
            try:
                status, _, _ = _get(f"http://localhost:{port}{bad}")
            except urllib.error.HTTPError as e:
                status = e.code
            assert status == 404, bad
    finally:
        stop_preview_server(server)
    # the listening socket is closed too: rebinding the port succeeds
    s2 = start_preview_server(d, port=port)
    stop_preview_server(s2)


def test_cli_serves_latest_preview_during_run(tmp_path):
    """--serve_preview serves the growing mosaic WHILE the incremental CLI
    runs (the reference publishes per update; here a browser would see the
    same)."""
    from aerial_mapper_tpu.cli import (
        main_make_synthetic_dataset,
        main_ortho_backward_grid_incremental,
    )

    d = str(tmp_path / "ds")
    main_make_synthetic_dataset.main([
        "--output_directory", d, "--num_images", "10",
        "--image_width", "96", "--image_height", "64",
        "--focal_length", "96", "--altitude", "454", "--spacing", "5",
    ])
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    preview = str(tmp_path / "preview")

    got = {}

    def run():
        main_ortho_backward_grid_incremental.main([
            "--data_directory", d, "--prefix_images", "image_",
            "--center_easting", "12", "--center_northing", "0",
            "--delta_easting", "30", "--delta_northing", "32",
            "--num_disparities", "32", "--update_every_nth", "2",
            "--interpolation_radius", "2.0", "--check_every", "1",
            "--serve_preview", str(port), "--preview_dir", preview,
            "--orthomosaic_jpg_filename",
            str(tmp_path / "ortho_inc.jpg"),
        ])

    t = threading.Thread(target=run)
    t.start()
    try:
        deadline = time.time() + 240.0
        while time.time() < deadline and t.is_alive():
            try:
                status, headers, body = _get(
                    f"http://localhost:{port}/ortho_live.png", timeout=2.0)
                if status == 200 and body[:4] == b"\x89PNG":
                    got["png"] = body
                    status, _, page = _get(f"http://localhost:{port}/",
                                           timeout=2.0)
                    got["page"] = page
                    break
            except (urllib.error.URLError, ConnectionError, OSError):
                pass
            time.sleep(0.1)
    finally:
        t.join(timeout=300.0)
    assert not t.is_alive()
    assert "png" in got, "server never served the live mosaic during the run"
    assert b"live mapping preview" in got["page"]


def test_cloud_topdown_panel_renders_points():
    """The cloud preview renderer: nadir z-buffer scatter in the map's
    geotransform, palette-colored by elevation, dark background."""
    from aerial_mapper_tpu.stereo.visualize import cloud_topdown_panel

    pts = np.array([
        [0.5, -0.5, 400.0],   # pixel (0, 0)
        [0.5, -0.5, 420.0],   # same pixel, higher -> wins the z-buffer
        [3.5, -2.5, 410.0],   # pixel (2, 3)
        [99.0, -99.0, 405.0],  # outside -> dropped
    ])
    panel = cloud_topdown_panel(pts, west=0.0, north=0.0, resolution=1.0,
                                height=4, width=4, z_range=(400.0, 420.0))
    assert panel.shape == (4, 4, 3) and panel.dtype == np.uint8
    bg = np.array([17, 17, 17], np.uint8)
    assert (panel[0, 0] != bg).any() and (panel[2, 3] != bg).any()
    assert (panel[1, 1] == bg).all()
    # the z-buffer kept the HIGH point: (0,0) renders the palette top,
    # not the palette bottom
    from aerial_mapper_tpu.utils.palettes import apply_palette

    top = apply_palette(np.array([[420.0]]), "terrain", vmin=400.0,
                        vmax=420.0)[0, 0]
    np.testing.assert_array_equal(panel[0, 0], top)
    # empty cloud: valid panel, all background
    empty = cloud_topdown_panel(np.zeros((0, 3)), west=0.0, north=0.0,
                                resolution=1.0, height=2, width=2)
    assert (empty == bg).all()


def test_cli_cloud_preview_single_device(tmp_path):
    """--serve_preview on the single-device driver also serves the
    growing point cloud (the rviz PointCloud2 analogue, stereo.cpp:78-79)
    as a top-down scatter PNG + raw decimated npz."""
    from aerial_mapper_tpu.cli import (
        main_make_synthetic_dataset,
        main_ortho_backward_grid_incremental,
    )

    d = str(tmp_path / "ds")
    main_make_synthetic_dataset.main([
        "--output_directory", d, "--num_images", "8",
        "--image_width", "96", "--image_height", "64",
        "--focal_length", "96", "--altitude", "454", "--spacing", "5",
    ])
    preview = str(tmp_path / "preview")
    main_ortho_backward_grid_incremental.main([
        "--data_directory", d, "--prefix_images", "image_",
        "--center_easting", "12", "--center_northing", "0",
        "--delta_easting", "30", "--delta_northing", "32",
        "--num_disparities", "32", "--update_every_nth", "2",
        "--interpolation_radius", "2.0", "--no-auto_shard",
        "--preview_every_updates", "1", "--preview_dir", preview,
        "--orthomosaic_jpg_filename", str(tmp_path / "o.jpg"),
    ])
    assert os.path.exists(os.path.join(preview, "cloud_live.png"))
    z = np.load(os.path.join(preview, "cloud_live.npz"))
    pts = z["points"]
    assert pts.shape[0] > 100 and pts.shape[1] == 3
    # the decimated cloud sits on the synthetic terrain
    assert 380.0 < np.median(pts[:, 2]) < 430.0
    from PIL import Image

    panel = np.asarray(Image.open(os.path.join(preview, "cloud_live.png")))
    bg = (panel == 17).all(axis=-1)
    assert (~bg).mean() > 0.05  # a visible scatter, not an empty frame
    # the index page links the cloud figure
    from aerial_mapper_tpu.io.preview_server import _PAGE

    assert "cloud_live.png" in _PAGE
