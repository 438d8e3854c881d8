"""CLI: forward-homography orthomosaic with feather blending.

Mirrors ``aerial_mapper_demos_ortho_forward_homography``
(main-ortho-forward-homography.cc:42-103; rafz flagfile
flags/1-real-rafz-ortho-from-homography.ff).
"""

import argparse

from aerial_mapper_tpu.cli import common


def _translate_reference_flags(argv):
    """Make the reference's rafz flagfile work verbatim
    (flags/1-real-rafz-ortho-from-homography.ff): strip the
    ``forward_homography_`` flag prefix and fold the three
    ``origin_{easting,northing,elevation}_m`` flags into
    ``--mosaic_origin E N ALT`` — in the reference, ``settings_.origin`` is
    the MOSAIC frame origin subtracted from ground intersections
    (ortho-forward-homography.cc:95-101), not a pose offset.
    """
    argv = common.strip_flag_prefix(argv, "forward_homography_")
    origin = {}
    out = []
    for a in argv:
        matched = False
        for axis in ("easting", "northing", "elevation"):
            key = f"--origin_{axis}_m"
            if a.startswith(key + "="):
                origin[axis] = a.split("=", 1)[1]
                matched = True
        if not matched:
            out.append(a)
    if origin:
        out += ["--mosaic_origin", origin.get("easting", "0"),
                origin.get("northing", "0"), origin.get("elevation", "0")]
    return out


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--ground_plane_elevation_m", type=float, default=414.0)
    p.add_argument("--width_mosaic_pixels", type=int, default=1000)
    p.add_argument("--height_mosaic_pixels", type=int, default=1000)
    p.add_argument("--mosaic_resolution", type=float, default=1.0)
    p.add_argument("--mosaic_origin", type=float, nargs=3,
                   default=(0.0, 0.0, 0.0), metavar=("E", "N", "ALT"))
    p.add_argument("--batch", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--filename_mosaic_output", default="/tmp/mosaic.jpg")
    p.add_argument("--output_geotiff", default=None)
    common.add_multicam_flag(p)
    args = common.parse(p, _translate_reference_flags(argv))

    from aerial_mapper_tpu.pipeline.batch import run_ortho_forward_homography

    datasets = common.datasets_from_args(args)
    dataset = datasets[0] if datasets else common.dataset_from_args(args)
    cfg = common.pipeline_config_from_args(args)
    run_ortho_forward_homography(
        dataset, cfg,
        output_jpg=args.filename_mosaic_output,
        output_geotiff=args.output_geotiff,
        output_report_html=args.report_html,
        utm_zone=args.utm_zone,
        datasets=datasets,
    )


if __name__ == "__main__":
    main()
