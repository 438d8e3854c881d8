"""CLI: export a PIX4D geofile (image name + camera position per line).

Mirrors ``aerial_mapper_demos_generate_pix4d_geofile``
(main-generate-pix4d-geofile.cc + exportPix4dGeofile,
aerial-mapper-io.cc:272-307).
"""

import os

from aerial_mapper_tpu.cli import common


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--output_directory", default="/tmp/pix4d")
    p.add_argument("--georeference_every_nth_image", type=int, default=1)
    args = common.parse(p, argv)

    from aerial_mapper_tpu.io.images import save_image

    dataset = common.dataset_from_args(args)
    quats_c, trans_c = dataset.camera_poses()
    os.makedirs(args.output_directory, exist_ok=True)
    geofile = os.path.join(args.output_directory, "geofile.txt")
    with open(geofile, "w") as f:
        for i, image in enumerate(dataset.images):
            number = i + 1
            if number % args.georeference_every_nth_image != 0:
                continue
            name = f"image_{number:010d}.jpeg"
            save_image(os.path.join(args.output_directory, name), image)
            xyz = trans_c[i]
            f.write(f"{name} {xyz[0]:.15g} {xyz[1]:.15g} {xyz[2]:.15g}\n")
    print(f"Wrote {geofile}")


if __name__ == "__main__":
    main()
