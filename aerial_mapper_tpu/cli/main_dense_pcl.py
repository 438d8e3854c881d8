"""CLI: dense point cloud from virtual stereo.

Mirrors ``aerial_mapper_demos_dense_pcl`` (main-dense-pcl.cc:35-75).
"""

from aerial_mapper_tpu.cli import common


def main(argv=None):
    p = common.base_parser(__doc__)
    common.add_stereo_flags(p)
    p.add_argument("--output_cloud_txt", default="/tmp/point_cloud.txt")
    p.add_argument("--output_cloud_npz", default=None)
    common.add_multicam_flag(p)
    args = common.parse(p, argv)

    from aerial_mapper_tpu.pipeline.batch import run_dense_pcl

    datasets = common.datasets_from_args(args)
    dataset = datasets[0] if datasets else common.dataset_from_args(args)
    cfg = common.pipeline_config_from_args(args)
    run_dense_pcl(
        dataset, cfg,
        output_cloud_txt=args.output_cloud_txt,
        output_cloud_npz=args.output_cloud_npz,
        datasets=datasets,
    )


if __name__ == "__main__":
    main()
