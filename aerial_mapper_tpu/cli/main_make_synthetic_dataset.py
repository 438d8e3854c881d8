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
    p.add_argument("--num_cameras", type=int, default=1,
                   help="Rig size: cameras beyond 0 pitch about the body "
                        "x (flight) axis on alternating sides in "
                        "camera_tilt_deg steps (cam1 +tilt, cam2 -tilt, "
                        "cam3 +2*tilt, cam4 -2*tilt, ...), and their "
                        "streams land in cam<j>/image_<i>.jpg — load "
                        "with --all_cameras --prefix_images "
                        "'cam{cam}/image_'.")
    p.add_argument("--camera_tilt_deg", type=float, default=20.0)
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
    # rig extrinsics: camera 0 nadir (identity); camera j > 0 pitched
    # about the body x (flight/east) axis by ±camera_tilt_deg on
    # alternating sides — an oblique-rig survey layout
    R_B_Cs = []
    for j in range(max(1, args.num_cameras)):
        if j == 0:
            R_B_Cs.append(np.eye(3))
            continue
        sign = 1.0 if j % 2 == 1 else -1.0
        th = sign * np.deg2rad(args.camera_tilt_deg) * ((j + 1) // 2)
        R_B_Cs.append(np.array(
            [[1.0, 0.0, 0.0],
             [0.0, np.cos(th), -np.sin(th)],
             [0.0, np.sin(th), np.cos(th)]]
        ))
    rig = CameraRig(
        cameras=(cam,) * len(R_B_Cs),
        T_C_B_quats=np.stack(
            [_quat_from_matrix_np(R.T) for R in R_B_Cs]
        ),
        T_C_B_trans=np.zeros((len(R_B_Cs), 3)),
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

    multicam = len(R_B_Cs) > 1
    for j, R_B_C in enumerate(R_B_Cs):
        if multicam:
            cam_dir = os.path.join(args.output_directory, f"cam{j}")
            os.makedirs(cam_dir, exist_ok=True)
        else:
            cam_dir = args.output_directory
        for i, (R, t) in enumerate(zip(Rs, ts)):
            img = render_image(
                scene, cam,
                jnp.asarray(R @ R_B_C, jnp.float32),
                jnp.asarray(t, jnp.float32),
                apply_distortion=args.with_distortion,
                color=args.color,
            )
            save_image(os.path.join(cam_dir, f"image_{i}.jpg"),
                       np.asarray(img))

    print(f"Wrote {len(R_B_Cs)} camera(s) x {args.num_images} images + "
          f"poses + rig to {args.output_directory}")


if __name__ == "__main__":
    main()
