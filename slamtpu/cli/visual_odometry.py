"""Full VO pipeline CLI, mirroring examples/visual_odometry.rs.

Usage:
  python -m slamtpu.cli.visual_odometry <input> [--fx F --fy F --cx F --cy F]
      [--max-features N] [--chunk N] [--output trajectory_output.json]

<input>: video file, image directory, "synthetic:<T>[x<H>x<W>]", or .npy.
The reference's hand-rolled --fx/--fy/--cx/--cy parsing
(visual_odometry.rs:244-283) becomes argparse; defaults are the KITTI preset
like the reference.
"""

from __future__ import annotations

import argparse
import time



def main(argv=None):
    parser = argparse.ArgumentParser(description="slamtpu visual odometry")
    parser.add_argument("input")
    parser.add_argument("--fx", type=float)
    parser.add_argument("--fy", type=float)
    parser.add_argument("--cx", type=float)
    parser.add_argument("--cy", type=float)
    parser.add_argument("--max-features", type=int, default=1000)  # example default (:57)
    parser.add_argument("--max-frames", type=int)
    parser.add_argument(
        "--chunk", type=int, default=32,
        help="frames per jit program (the TPU detector's safe batch "
        "envelope is 32 frames/program — see feature/detector.py note)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", default="trajectory_output.json")
    parser.add_argument("--config", metavar="JSON", help="SlamConfig file (utils/config.py)")
    parser.add_argument(
        "--plot", metavar="PNG",
        help="write the top-down X-Z trajectory plot (the reference's GUI "
        "window, visual_odometry.rs:300-391, as a file; needs cv2)",
    )
    parser.add_argument(
        "--gt", metavar="POSES_TXT",
        help="KITTI ground-truth pose file; prints ATE (Sim3-aligned, the "
        "monocular convention) over the trajectory's keyframes "
        "(the ground-truth comparison the reference lists as TODO.md:90)",
    )
    args = parser.parse_args(argv)

    import dataclasses

    from ..feature.detector import OrbConfig
    from ..io.video import load_frames
    from ..odometry.camera import CameraIntrinsics
    from ..pipeline.vo import VoConfig, run_vo

    frames, cam, fps = load_frames(args.input, max_frames=args.max_frames)
    if args.fx is not None:
        cam = CameraIntrinsics(args.fx, args.fy or args.fx, args.cx or 0.0, args.cy or 0.0)
    elif cam is None:
        cam = CameraIntrinsics.kitti()
    print(f"Loaded {frames.shape[0]} frames {frames.shape[1]}x{frames.shape[2]}")
    print(f"Intrinsics: fx={cam.fx} fy={cam.fy} cx={cam.cx} cy={cam.cy}")

    if args.config:
        from ..utils.config import load_config

        slam_cfg = load_config(args.config)
        config = dataclasses.replace(slam_cfg.vo(), fps=fps)
    else:
        config = VoConfig(orb=OrbConfig(max_features=args.max_features), fps=fps)
    start = time.time()
    run = run_vo(frames, cam, config, chunk_size=args.chunk, seed=args.seed)
    elapsed = time.time() - start

    # Summary block mirroring visual_odometry.rs:224-239.
    print("\nSummary")
    print(f"Total frames: {run.total_frames}")
    print(f"Successful poses: {run.successful_frames}")
    print(f"Failed poses: {run.failed_frames}")
    print(f"Keyframes selected: {run.keyframe_count}")
    print(f"Keyframe ratio: {100.0 * run.keyframe_ratio:.1f}%")
    print(f"Total distance: {run.trajectory.total_distance():.2f}m")
    print(f"Total time: {elapsed:.2f}s")
    print(f"Average FPS: {run.total_frames / elapsed:.2f}")

    run.trajectory.save_to_file(args.output)
    print(f"\nTrajectory saved to: {args.output}")
    if args.plot:
        from ..utils.viz import save_trajectory_plot

        save_trajectory_plot(run.trajectory, args.plot)
        print(f"Trajectory plot saved to: {args.plot}")
    if args.gt:
        import numpy as np

        from ..io.kitti import load_poses
        from ..utils.evaluate import ate_rmse

        gt_poses = load_poses(args.gt)
        # Trajectory points carry the reference's 1-based frame numbering
        # (point 0 is the frame-0 origin). Frames beyond the GT file are a
        # sequence mismatch — score only the covered prefix and say so.
        est, gt, dropped = [], [], 0
        for p in run.trajectory.points:
            idx = max(p.frame - 1, 0)
            if idx >= gt_poses.shape[0]:
                dropped += 1
                continue
            est.append(p.position)
            gt.append(gt_poses[idx, :3, 3])
        if dropped:
            print(
                f"Warning: ground-truth file has {gt_poses.shape[0]} poses but the "
                f"trajectory reaches frame {run.trajectory.points[-1].frame}; "
                f"{dropped} keyframes beyond it were excluded from the ATE"
            )
        if len(est) < 2:
            print("ATE vs ground truth: not enough overlapping keyframes")
        else:
            ate = ate_rmse(np.asarray(est), np.asarray(gt), align="sim3")
            print(f"ATE vs ground truth (Sim3-aligned, {len(est)} keyframes): {ate:.3f} m")


if __name__ == "__main__":
    main()
