"""CLI: forward-homography orthomosaic with feather blending.

Mirrors ``aerial_mapper_demos_ortho_forward_homography``
(main-ortho-forward-homography.cc:42-103; rafz flagfile
flags/1-real-rafz-ortho-from-homography.ff).
"""

from aerial_mapper_tpu.cli import common


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--ground_plane_elevation_m", type=float, default=414.0)
    p.add_argument("--width_mosaic_pixels", type=int, default=1000)
    p.add_argument("--height_mosaic_pixels", type=int, default=1000)
    p.add_argument("--mosaic_resolution", type=float, default=1.0)
    p.add_argument("--mosaic_origin", type=float, nargs=3,
                   default=(0.0, 0.0, 0.0), metavar=("E", "N", "ALT"))
    p.add_argument("--batch", action="store_true", default=True)
    p.add_argument("--filename_mosaic_output", default="/tmp/mosaic.jpg")
    p.add_argument("--output_geotiff", default=None)
    args = common.parse(p, argv)

    from aerial_mapper_tpu.pipeline.batch import run_ortho_forward_homography

    dataset = common.dataset_from_args(args)
    cfg = common.pipeline_config_from_args(args)
    run_ortho_forward_homography(
        dataset, cfg,
        output_jpg=args.filename_mosaic_output,
        output_geotiff=args.output_geotiff,
        utm_zone=args.utm_zone,
    )


if __name__ == "__main__":
    main()
