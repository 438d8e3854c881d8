"""CLI: convert simulator output (ROS-csv poses + timestamped images) to the
Standard dataset layout.

Mirrors ``AerialMapperIO::convertFromSimulation`` / ``toStandardFormat``
(aerial-mapper-io.cc:123-205): load ROS-csv body poses with timestamps,
associate each image (named by timestamp/id) with its pose, and write
``opt_poses.txt`` (Standard format) + ``image_<i>.jpg`` renumbered
sequentially — the layout every demo CLI consumes.
"""

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_directory", required=True,
                   help="Directory with the simulator output.")
    p.add_argument("--filename_poses_csv", default="vi_imu_poses.csv",
                   help="ROS-csv: time x y z qx qy qz qw")
    p.add_argument("--filename_id_time", default="blender_id_time.csv",
                   help="rows of: id image_timestamp")
    p.add_argument("--images_subdirectory", default="cam0")
    p.add_argument("--image_extension", default=".png")
    p.add_argument("--timestamp_offset", type=int, default=-1,
                   help="image timestamp = name + offset "
                        "(aerial-mapper-io.cc:158 uses -1)")
    p.add_argument("--output_directory", required=True)
    args = p.parse_args(sys.argv[1:] if argv is None else argv)

    import numpy as np

    from aerial_mapper_tpu.io.images import load_images_by_names, save_image
    from aerial_mapper_tpu.io.poses import (
        PoseFormat,
        load_poses,
        save_poses_standard,
    )

    quats, trans, timestamps = load_poses(
        os.path.join(args.input_directory, args.filename_poses_csv),
        PoseFormat.ROS,
    )
    ts_int = np.asarray(timestamps, np.int64)

    names, image_ts = [], []
    with open(os.path.join(args.input_directory,
                           args.filename_id_time)) as f:
        for line in f:
            parts = line.replace(",", " ").split()
            if len(parts) < 2:
                continue
            name_val = int(float(parts[1]))
            names.append(str(name_val))
            image_ts.append(name_val + args.timestamp_offset)

    # associate images to poses by exact timestamp (cc:164-178)
    sel_q, sel_t, sel_names = [], [], []
    for name, t in zip(names, image_ts):
        hits = np.nonzero(ts_int == t)[0]
        if hits.size == 0:
            print(f"warning: no pose for image {name} (t={t}); skipped",
                  file=sys.stderr)
            continue
        sel_q.append(quats[hits[0]])
        sel_t.append(trans[hits[0]])
        sel_names.append(name)
    if not sel_names:
        raise SystemExit("No image/pose associations found")

    os.makedirs(args.output_directory, exist_ok=True)
    save_poses_standard(
        os.path.join(args.output_directory, "opt_poses.txt"),
        np.asarray(sel_q), np.asarray(sel_t),
    )
    images = load_images_by_names(
        os.path.join(args.input_directory, args.images_subdirectory),
        sel_names, extension=args.image_extension,
    )
    for i, img in enumerate(images):
        save_image(os.path.join(args.output_directory, f"image_{i}.jpg"),
                   img)
    print(f"converted {len(images)} frames -> {args.output_directory}")


if __name__ == "__main__":
    main()
