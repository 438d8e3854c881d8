"""CLI: generate a synthetic aerial survey dataset on disk.

The framework's replacement for the reference's downloadable cadastre sample
(install/test_aerial_mapper:20-23 — no egress here): writes images
(image_<i>.jpg), Standard-format poses (opt_poses.txt), and a camera rig
YAML in the exact layout the demo CLIs (and the reference flagfiles)
expect. Ground truth is ANALYTIC, not written to disk: evaluate
``synth.scene.SyntheticScene.height/texture`` at any map's cell centers
(what the test suite and bench oracles do). Also doubles as the reference-to-TPU
conversion utility (the reference's convertFromSimulation,
aerial-mapper-io.cc:123-205, fills the same role for Blender/Gazebo output).
"""

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--num_images", type=int, default=50)
    p.add_argument("--image_width", type=int, default=752)
    p.add_argument("--image_height", type=int, default=480)
    p.add_argument("--focal_length", type=float, default=480.0)
    p.add_argument("--altitude", type=float, default=514.0)
    p.add_argument("--spacing", type=float, default=6.0)
    p.add_argument("--num_lines", type=int, default=1)
    p.add_argument("--line_spacing", type=float, default=60.0)
    p.add_argument("--relief_amplitude", type=float, default=6.0)
    p.add_argument("--base_elevation", type=float, default=414.0)
    p.add_argument("--pose_jitter", type=float, default=0.0)
    p.add_argument("--with_distortion", action=argparse.BooleanOptionalAction)
    p.add_argument("--color", action=argparse.BooleanOptionalAction,
                   help="Render RGB images (analytic hue tint).")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from aerial_mapper_tpu.camera.models import Camera
    from aerial_mapper_tpu.camera.rig import CameraRig, save_camera_rig
    from aerial_mapper_tpu.io.images import save_image
    from aerial_mapper_tpu.io.poses import (
        _quat_from_matrix_np,
        save_poses_standard,
    )
    from aerial_mapper_tpu.synth.scene import (
        SyntheticScene,
        make_survey_poses,
        render_image,
    )

    os.makedirs(args.output_directory, exist_ok=True)
    cam = Camera(
        fx=args.focal_length, fy=args.focal_length,
        cx=args.image_width / 2.0, cy=args.image_height / 2.0,
        width=args.image_width, height=args.image_height,
        dist_kind="radial-tangential" if args.with_distortion else "none",
        dist_params=(-0.28, 0.07, 1.8e-4, 7.6e-5) if args.with_distortion
        else (0.0, 0.0, 0.0, 0.0),
    )
    rig = CameraRig(
        cameras=(cam,),
        T_C_B_quats=np.array([[1.0, 0.0, 0.0, 0.0]]),
        T_C_B_trans=np.zeros((1, 3)),
    )
    save_camera_rig(rig, os.path.join(args.output_directory,
                                      "camera_fixed_wing.yaml"))

    scene = SyntheticScene(base_elevation=args.base_elevation,
                           relief_amplitude=args.relief_amplitude)
    Rs, ts = make_survey_poses(
        args.num_images, altitude=args.altitude, spacing=args.spacing,
        num_lines=args.num_lines, line_spacing=args.line_spacing,
        jitter=args.pose_jitter, seed=args.seed,
    )
    quats = np.stack([_quat_from_matrix_np(R) for R in Rs])
    save_poses_standard(os.path.join(args.output_directory, "opt_poses.txt"),
                        quats, ts)

    for i, (R, t) in enumerate(zip(Rs, ts)):
        img = render_image(
            scene, cam, jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32),
            apply_distortion=args.with_distortion,
            color=args.color,
        )
        save_image(os.path.join(args.output_directory, f"image_{i}.jpg"),
                   np.asarray(img))

    print(f"Wrote {args.num_images} images + poses + rig to "
          f"{args.output_directory}")


if __name__ == "__main__":
    main()
