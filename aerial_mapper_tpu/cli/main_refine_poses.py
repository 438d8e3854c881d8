"""CLI: refine a trajectory by feature tracks + windowed bundle adjustment.

The BASELINE.json config-4 stage (no reference equivalent — the reference
assumes pre-optimized poses): detect+match features, build tracks,
triangulate, run Schur-complement BA, and write the refined poses in
Standard format for the downstream demos.
"""

from aerial_mapper_tpu.cli import common


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--output_poses", default="/tmp/refined_poses.txt")
    p.add_argument("--num_corners", type=int, default=512)
    p.add_argument("--match_window", type=int, default=2)
    p.add_argument("--ba_iterations", type=int, default=12)
    p.add_argument("--position_prior_sigma_m", type=float, default=3.0)
    args = common.parse(p, argv)

    import jax.numpy as jnp
    import numpy as np

    from aerial_mapper_tpu.config import BundleAdjustmentConfig
    from aerial_mapper_tpu.features import refine_poses
    from aerial_mapper_tpu.io.poses import save_poses_standard

    dataset = common.dataset_from_args(args)
    quats_c, trans_c = dataset.camera_poses()
    images = [jnp.asarray(im, jnp.float32) for im in dataset.images]
    q_ref, t_ref, stats = refine_poses(
        images, quats_c, trans_c, dataset.rig.camera,
        ba_cfg=BundleAdjustmentConfig(
            max_iterations=args.ba_iterations,
            position_prior_sigma_m=args.position_prior_sigma_m,
        ),
        num_corners=args.num_corners,
        match_window=args.match_window,
    )
    # NOTE: refined poses are CAMERA poses; convert back to body frame
    # through the rig extrinsics (T_G_B = T_G_C * T_C_B)
    from aerial_mapper_tpu.io.poses import camera_to_body_poses

    quats_b, trans_b = camera_to_body_poses(dataset.rig, np.asarray(q_ref),
                                            np.asarray(t_ref))
    save_poses_standard(args.output_poses, quats_b, trans_b)
    print(f"refined {len(images)} poses -> {args.output_poses} "
          f"(tracks={stats['tracks']}, matches={stats['matches']})")


if __name__ == "__main__":
    main()
