"""CLI: incremental "mapping on the fly" backward-grid orthomosaic.

Mirrors ``aerial_mapper_demos_ortho_backward_grid_incremental``
(main-ortho-backward-grid-incremental.cc:64-170).
"""

import argparse

from aerial_mapper_tpu.cli import common
from aerial_mapper_tpu.cli.main_ortho_backward_grid import _strip_prefix


def main(argv=None):
    p = common.base_parser(__doc__)
    common.add_grid_flags(p)
    common.add_stereo_flags(p)
    common.add_dsm_flags(p)
    p.add_argument("--orthomosaic_elevation_m", type=float, default=0.0)
    p.add_argument("--use_digital_elevation_map", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--colored_ortho", action=argparse.BooleanOptionalAction)
    p.add_argument("--update_every_nth", type=int, default=5,
                   help="Map update cadence in frames.")
    p.add_argument("--orthomosaic_jpg_filename", default="/tmp/ortho_incr.jpg")
    p.add_argument("--save_updates_to", default="",
                   help="Directory for per-update mosaic snapshots.")
    args = common.parse(p, _strip_prefix(argv))

    import numpy as np

    from aerial_mapper_tpu.io.images import save_image
    from aerial_mapper_tpu.pipeline.incremental import run_incremental

    dataset = common.dataset_from_args(args)
    cfg = common.pipeline_config_from_args(args)

    def on_update(step, layers, geom):
        if args.save_updates_to:
            save_image(
                f"{args.save_updates_to}/ortho_{step:06d}.jpg",
                np.asarray(layers["ortho"]),
            )

    layers, geom = run_incremental(
        dataset, cfg, update_every_nth=args.update_every_nth,
        on_update=on_update,
    )
    save_image(args.orthomosaic_jpg_filename, np.asarray(layers["ortho"]))


if __name__ == "__main__":
    main()
