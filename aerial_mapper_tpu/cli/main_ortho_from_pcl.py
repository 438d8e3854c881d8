"""CLI: orthomosaic from a point cloud by intensity IDW.

Mirrors ``aerial_mapper_demos_ortho_from_pcl`` (main-ortho-from-pcl.cc).
"""

import argparse

from aerial_mapper_tpu.cli import common


def main(argv=None):
    p = common.base_parser(__doc__)
    common.add_grid_flags(p)
    common.add_stereo_flags(p)
    common.add_reference_compat_flags(p)
    p.add_argument("--interpolation_radius", type=float, default=2.0)
    p.add_argument("--adaptive_interpolation", action=argparse.BooleanOptionalAction)
    p.add_argument("--use_adaptive_interpolation",
                   dest="adaptive_interpolation",
                   action=argparse.BooleanOptionalAction,
                   help="reference spelling (ortho-from-pcl flagfiles)")
    p.add_argument("--point_cloud_filename", default="")
    p.add_argument("--orthomosaic_jpg_filename", default="/tmp/ortho_pcl.jpg")
    p.add_argument("--output_geotiff", default=None)
    common.add_multicam_flag(p)
    # the reference prefixes these flags with ortho_from_pcl_
    # (flags/0-synthetic-cadastre-ortho-from-pcl.ff)
    args = common.parse(p, common.strip_flag_prefix(argv,
                                                    "ortho_from_pcl_"))

    from aerial_mapper_tpu.io.pointcloud import load_point_cloud_txt
    from aerial_mapper_tpu.pipeline.batch import run_ortho_from_pcl

    cloud = None
    dataset = None
    datasets = None
    if args.point_cloud_filename:
        cloud = load_point_cloud_txt(args.point_cloud_filename)
    else:
        datasets = common.datasets_from_args(args)
        dataset = (datasets[0] if datasets
                   else common.dataset_from_args(args))
    cfg = common.pipeline_config_from_args(args)
    run_ortho_from_pcl(
        dataset, cfg, point_cloud=cloud,
        output_jpg=args.orthomosaic_jpg_filename,
        output_geotiff=args.output_geotiff,
        output_report_html=args.report_html,
        utm_zone=args.utm_zone,
        datasets=datasets,
    )


if __name__ == "__main__":
    main()
