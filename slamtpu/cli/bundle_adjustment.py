"""Synthetic bundle-adjustment demo CLI, mirroring
examples/bundle_adjustment.rs: ground-truth points and poses, perturbed
initial estimates, full BA, then a local-BA window demo.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="slamtpu bundle adjustment demo")
    parser.add_argument("--poses", type=int, default=4)
    parser.add_argument("--points", type=int, default=4)
    parser.add_argument("--iterations", type=int, default=30)  # example:62-86
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from scipy.spatial.transform import Rotation

    from ..mapping.bundle_adjustment import BundleAdjuster, Observation
    from ..odometry.camera import CameraIntrinsics
    from ..ops.lie import so3_exp
    import jax.numpy as jnp

    rng = np.random.default_rng(args.seed)
    cam = CameraIntrinsics(500.0, 500.0, 320.0, 240.0)

    # Ground truth scene (example:12-41).
    gt_points = np.stack(
        [rng.uniform(-2, 2, args.points), rng.uniform(-1.5, 1.5, args.points), rng.uniform(6, 12, args.points)], 1
    )
    gt_poses = [
        (
            Rotation.from_rotvec(rng.normal(scale=0.02, size=3)).as_matrix(),
            np.array([0.4 * i, 0.0, 0.0]) + rng.normal(scale=0.02, size=3),
        )
        for i in range(args.poses)
    ]

    def project(pose, x):
        p = pose[0] @ x + pose[1]
        return np.array([cam.fx * p[0] / p[2] + cam.cx, cam.fy * p[1] / p[2] + cam.cy])

    observations = [
        Observation(i, j, project(gt_poses[i], gt_points[j]))
        for i in range(args.poses)
        for j in range(args.points)
    ]

    # Perturb (example:44-60: poses +/-0.05, points +/-0.1..0.15).
    noisy_poses = [
        (np.asarray(so3_exp(jnp.asarray(rng.uniform(-0.05, 0.05, 3)))) @ r, t + rng.uniform(-0.05, 0.05, 3))
        for r, t in gt_poses
    ]
    noisy_points = [p + rng.uniform(-0.15, 0.15, 3) for p in gt_points]

    ba = BundleAdjuster(cam).with_max_iterations(args.iterations)
    initial = ba.compute_total_error(noisy_poses, noisy_points, observations)
    print(f"Initial reprojection error: {initial:.4f}")

    start = time.time()
    new_poses, new_points, final = ba.optimize(noisy_poses, noisy_points, observations, True)
    ms = (time.time() - start) * 1000.0
    print(f"Final reprojection error: {final:.6f}")
    print(f"Error reduction: {100.0 * (1.0 - final / initial):.1f}%")
    print(f"Optimization time: {ms:.1f} ms")

    # Local BA demo with window 2 (example:115-141).
    _, _, local_err = ba.local_bundle_adjustment(noisy_poses, noisy_points, observations, 2)
    print(f"Local BA (window=2) final error: {local_err:.6f}")


if __name__ == "__main__":
    main()
