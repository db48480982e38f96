"""Turnkey real-data validation: one command from a KITTI sequence directory
to ATE / drift / flagship-map numbers vs the repo's gates (VERDICT r3 item 9).

Usage:
    python tools/run_kitti.py <sequence_dir> [--poses poses/NN.txt]
        [--weights DIR] [--max-frames N] [--out DIR]
    python tools/run_kitti.py synthetic            # dry run, exact GT

<sequence_dir> is a KITTI odometry layout (calib.txt, image_0/, times.txt —
slamtpu/io/kitti.py); `synthetic` renders a KITTI-sized textured scene with
exact ground truth so the whole path is exercisable before real data exists.

Outputs under --out (default ./kitti_run):
    trajectory.json      VO trajectory (reference-compatible format)
    point_cloud.ply/json flagship landmark map (reference-compatible)
    summary.json         every number printed, machine-readable

The first day this code meets real KITTI data, validation is:
    tools/run_kitti.sh /data/kitti/sequences/00 --poses /data/kitti/poses/00.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("sequence", help="KITTI sequence dir, or 'synthetic'")
    ap.add_argument("--poses", help="KITTI ground-truth poses txt (devkit format)")
    ap.add_argument("--weights", help="MonoDepth2 checkpoint dir (encoder/depth .pth)")
    ap.add_argument("--max-frames", type=int)
    ap.add_argument("--out", default="kitti_run")
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument(
        "--synthetic-shape", type=int, nargs=2, default=(376, 1241),
        metavar=("H", "W"),
        help="frame size for the synthetic dry run (intrinsics are rescaled); "
        "the regression test uses a reduced size so the kit's whole path "
        "stays cheap enough to run in the fast tier",
    )
    ap.add_argument(
        "--global-ba", action="store_true",
        help="run one joint bundle adjustment over ALL keyframes and logged "
        "observations after the flagship pass (pipeline.run_global_ba; "
        "auto-selects dense vs co-observation Schur) and report the total "
        "reprojection error before/after — the capability the TPU build "
        "claims over the reference's diagnostic-only BA "
        "(point_cloud.rs:309-371)",
    )
    args = ap.parse_args(argv)

    from slamtpu.pipeline.vo import VoConfig, run_vo
    from slamtpu.utils.evaluate import ate_rmse, kitti_relative_errors

    os.makedirs(args.out, exist_ok=True)
    summary = {}

    # ---- load ------------------------------------------------------------
    gt_poses = None  # [T, 4, 4] camera-to-world
    if args.sequence == "synthetic":
        from slamtpu.io.synthetic import render_sequence_cached
        from slamtpu.odometry.camera import CameraIntrinsics

        n = args.max_frames or 120
        height, width = args.synthetic_shape
        # KITTI intrinsics rescaled to the requested frame size (cx=607 on a
        # narrow frame would push every sprite out of view).
        k = CameraIntrinsics.kitti()
        sy, sx = height / 376.0, width / 1241.0
        cam_s = CameraIntrinsics(k.fx * sx, k.fy * sy, k.cx * sx, k.cy * sy)
        scene = render_sequence_cached(
            n_frames=n, height=height, width=width, n_points=4000, step=0.8,
            intrinsics=cam_s, seed=0, noise=2.0, motion="forward", textured=True,
        )
        frames, cam = scene.frames, scene.intrinsics
        # world-to-camera (R, t) -> camera-to-world 4x4 (the GT format the
        # KITTI devkit poses file uses).
        gt_poses = np.tile(np.eye(4), (n, 1, 1))
        gt_poses[:, :3, :3] = np.transpose(scene.rotations, (0, 2, 1))
        gt_poses[:, :3, 3] = -np.einsum(
            "tji,tj->ti", scene.rotations, scene.translations
        )
        print(f"synthetic dry run: {n} frames {frames.shape[1]}x{frames.shape[2]}")
    else:
        from slamtpu.io.kitti import load_poses, load_sequence

        frames, cam, _ = load_sequence(args.sequence, max_frames=args.max_frames)
        print(
            f"loaded {frames.shape[0]} frames {frames.shape[1]}x{frames.shape[2]} "
            f"fx={cam.fx:.1f} from {args.sequence}"
        )
        if args.poses:
            p = load_poses(args.poses)[: frames.shape[0]]
            gt_poses = np.tile(np.eye(4), (p.shape[0], 1, 1))
            gt_poses[:, :3, :] = p
    summary["n_frames"] = int(frames.shape[0])

    # ---- VO ----------------------------------------------------------------
    t0 = time.time()
    run = run_vo(frames, cam, VoConfig(), chunk_size=args.chunk, seed=0)
    vo_s = time.time() - t0
    fps = (frames.shape[0] - 1) / vo_s
    print(
        f"VO: {run.successful_frames}/{frames.shape[0] - 1} pose successes, "
        f"{run.keyframe_count} keyframes, {fps:.1f} frames/s (incl. compile)"
    )
    run.trajectory.save_to_file(os.path.join(args.out, "trajectory.json"))
    summary["vo"] = {
        "successes": int(run.successful_frames),
        "pairs": int(frames.shape[0] - 1),
        "frames_per_sec_incl_compile": fps,
    }

    success_rate = run.successful_frames / max(frames.shape[0] - 1, 1)
    gates = {"success_rate>=0.9": bool(success_rate >= 0.9)}

    if gt_poses is not None:
        # Compose our per-pair relative motions over the successful pairs and
        # compare against GT over the same pairs (monocular scale via sim3).
        ok = np.nonzero(run.success)[0]
        est = np.tile(np.eye(4), (len(ok) + 1, 1, 1))
        g = np.eye(4)
        for row, i in enumerate(ok):
            rel = np.eye(4)
            rel[:3, :3] = run.rotations[i]
            rel[:3, 3] = run.translations[i]
            g = g @ rel
            est[row + 1] = g
        est_pos = est[:, :3, 3]
        # GT over the same pairs: camera-to-world positions in meters.
        gt_pos = np.concatenate(
            [gt_poses[:1, :3, 3], gt_poses[ok + 1, :3, 3]], axis=0
        )
        ate = ate_rmse(est_pos, gt_pos, align="sim3")
        path_len = float(np.linalg.norm(np.diff(gt_pos, axis=0), axis=1).sum())

        # Devkit drift: align the (scale-free monocular) estimate into GT
        # METERS, then run the standard segment metric. On short paths the
        # 100-800 m devkit lengths find no segments; scale them down.
        from slamtpu.utils.evaluate import align_umeyama

        s, r, t = align_umeyama(est_pos, gt_pos)
        est_m = np.tile(np.eye(4), (est_pos.shape[0], 1, 1))
        est_m[:, :3, 3] = (s * (r @ est_pos.T)).T + t
        gt_m = np.tile(np.eye(4), (gt_pos.shape[0], 1, 1))
        gt_m[:, :3, 3] = gt_pos
        if path_len >= 900.0:
            lengths = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)
        else:
            lengths = tuple(path_len * f for f in (0.125, 0.25, 0.375, 0.5))
        rel_err = kitti_relative_errors(est_m, gt_m, lengths=lengths, step=5)
        print(
            f"ATE (sim3-aligned): {ate:.3f} over {path_len:.1f} path "
            f"({ate / max(path_len, 1e-9):.2%}); "
            f"drift {rel_err.t_rel_percent:.2f}% / "
            f"{rel_err.r_rel_deg_per_100m:.3f} deg/100m over {rel_err.n_segments} segments"
        )
        summary["ate_sim3"] = float(ate)
        summary["path_len"] = path_len
        summary["t_rel_percent"] = float(rel_err.t_rel_percent)
        gates["ate/path<=0.05"] = bool(ate / max(path_len, 1e-9) <= 0.05)

    # ---- flagship ----------------------------------------------------------
    from slamtpu.pipeline.point_cloud import PointCloudConfig, run_point_cloud_fused

    t0 = time.time()
    res = run_point_cloud_fused(frames, cam, PointCloudConfig(), chunk_size=args.chunk, seed=0)
    pc_s = time.time() - t0
    stable = sum(1 for p in res.points() if p.observations >= 2)
    print(
        f"flagship: {res.keyframe_frame_idx.shape[0]} keyframes, "
        f"{int(np.asarray(res.map_state.valid).sum())} landmarks ({stable} stable), "
        f"{res.ba_runs} BA runs, {(frames.shape[0] - 1) / pc_s:.1f} frames/s (incl. compile)"
    )
    if args.global_ba:
        from slamtpu.pipeline.point_cloud import run_global_ba

        t0 = time.time()
        res, err_before, err_after = run_global_ba(res, cam)
        print(
            f"global BA: total reprojection error {err_before:.1f} -> "
            f"{err_after:.1f} ({time.time() - t0:.1f}s, "
            f"{res.keyframe_frame_idx.shape[0]} poses)"
        )
        summary["global_ba"] = {
            "err_before": float(err_before),
            "err_after": float(err_after),
        }
        # The joint solve must not make the map worse (NaN-safe rollback
        # inside ba_solve guarantees this up to the last accepted step).
        gates["global_ba_no_worse"] = bool(err_after <= err_before * 1.001)

    from slamtpu.io.export import save_json, save_ply

    save_ply(res.points(), os.path.join(args.out, "point_cloud.ply"))
    save_json(res.points(), os.path.join(args.out, "point_cloud.json"))
    summary["flagship"] = {
        "keyframes": int(res.keyframe_frame_idx.shape[0]),
        "landmarks": int(np.asarray(res.map_state.valid).sum()),
        "stable_landmarks": int(stable),
        "ba_runs": int(res.ba_runs),
    }
    gates["ba_runs>0"] = bool(res.ba_runs > 0)
    gates["landmarks>=1000"] = bool(summary["flagship"]["landmarks"] >= 1000)

    # ---- depth (optional) ----------------------------------------------------
    if args.weights:
        from slamtpu.depth.monodepth2 import MonoDepth2

        enc = os.path.join(args.weights, "encoder.pth")
        dec = os.path.join(args.weights, "depth.pth")
        model = MonoDepth2(encoder_path=enc, depth_path=dec)
        t0 = time.time()
        disp = np.asarray(model.predict(frames[:8]))
        print(
            f"depth: {disp.shape} disparities in {time.time() - t0:.1f}s "
            "(abs-rel vs GT: tools/eval_depth.py with a GT depth file)"
        )
        summary["depth_smoke"] = True

    summary["gates"] = gates
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    failed = [k for k, v in gates.items() if not v]
    print("GATES:", "ALL PASS" if not failed else f"FAILED {failed}")
    print(f"artifacts in {args.out}/")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
