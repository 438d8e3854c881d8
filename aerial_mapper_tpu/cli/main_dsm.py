"""CLI: digital surface model from point cloud or image sequence.

Mirrors ``aerial_mapper_demos_dsm`` (main-dsm.cc:46-111).
"""

from aerial_mapper_tpu.cli import common


def main(argv=None):
    p = common.base_parser(__doc__)
    common.add_grid_flags(p)
    common.add_stereo_flags(p)
    common.add_dsm_flags(p)
    p.add_argument("--point_cloud_filename", default="",
                   help="Load cloud from txt instead of running stereo.")
    p.add_argument("--output_geotiff", default="/tmp/dsm.tif")
    p.add_argument("--output_layers_npz", default=None)
    p.add_argument("--output_png", default=None,
                   help="Optional false-color elevation PNG.")
    p.add_argument("--output_color_geotiff", default=None,
                   help="Optional palette-colored 3-band DEM GeoTiff "
                        "(writeDataToDEMGeoTiffColor parity).")
    p.add_argument("--color_palette", default="terrain",
                   help="Palette for --output_color_geotiff/--output_png.")
    common.add_refine_poses_flag(p)
    common.add_multicam_flag(p)
    args = common.parse(p, argv)

    from aerial_mapper_tpu.io.pointcloud import load_point_cloud_txt
    from aerial_mapper_tpu.pipeline.batch import run_dsm

    datasets = common.datasets_from_args(args)
    if datasets:
        datasets = common.maybe_refine_datasets(datasets, args)
        dataset = datasets[0]
    else:
        dataset = common.maybe_refine_poses(
            common.dataset_from_args(args), args)
    cfg = common.pipeline_config_from_args(args)
    cloud = None
    if args.point_cloud_filename:
        cloud = load_point_cloud_txt(args.point_cloud_filename)
    layers, geom = run_dsm(
        dataset, cfg, point_cloud=cloud,
        output_geotiff=args.output_geotiff,
        output_layers_npz=args.output_layers_npz,
        output_report_html=args.report_html,
        utm_zone=args.utm_zone,
        datasets=datasets,
    )
    if args.output_png:
        import numpy as np

        from aerial_mapper_tpu.io.images import save_image
        from aerial_mapper_tpu.utils.palettes import apply_palette

        save_image(args.output_png,
                   apply_palette(np.asarray(layers["elevation"]),
                                 args.color_palette))
    if args.output_color_geotiff:
        import numpy as np

        from aerial_mapper_tpu.io.geotiff import write_dem_geotiff_color

        write_dem_geotiff_color(
            args.output_color_geotiff, np.asarray(layers["elevation"]),
            west=geom.west, north=geom.north, resolution=geom.resolution,
            palette=args.color_palette, utm_zone=args.utm_zone,
        )


if __name__ == "__main__":
    main()
