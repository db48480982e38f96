"""Benchmark: whole-pipeline VO throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} on stdout
(everything else goes to stderr). Baseline target: 500 VO frames/sec/chip on
KITTI-sized frames (BASELINE.json north_star; the reference publishes no
numbers of its own — /root/reference/TODO.md:90).

The measured quantity is steady-state end-to-end VO: ORB detection (8-level
pyramid), frame-pair Hamming matching, 1000-hypothesis RANSAC essential +
pose recovery, keyframe scan, and trajectory composition, on 1241x376
(KITTI odometry camera) frames, including host->device frame transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    t_total = int(os.environ.get("BENCH_FRAMES", "257"))
    chunk = int(os.environ.get("BENCH_CHUNK", "32"))
    height, width = 376, 1241

    import jax

    log(f"devices: {jax.devices()}")

    from slamtpu.feature.detector import OrbConfig, detect_and_compute
    from slamtpu.io.synthetic import render_sequence
    from slamtpu.mapping.keyframe import KeyframeState
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.pipeline.vo import VoConfig, vo_chunk

    log(f"rendering {t_total} synthetic KITTI-sized frames ({height}x{width})...")
    t0 = time.time()
    scene = render_sequence(
        n_frames=t_total,
        height=height,
        width=width,
        n_points=2500,
        step=0.8,
        intrinsics=CameraIntrinsics.kitti(),
        seed=0,
        noise=2.0,
    )
    frames = scene.frames.astype(np.float32)
    log(f"rendered in {time.time() - t0:.1f}s")

    config = VoConfig(orb=OrbConfig(max_features=500))
    cam = scene.intrinsics
    step = jax.jit(vo_chunk, static_argnames=("config",))

    n_pairs = t_total - 1
    keys = jax.random.split(jax.random.PRNGKey(0), n_pairs)

    feats0 = jax.tree_util.tree_map(
        lambda x: x[0], detect_and_compute(frames[:1], config.orb)
    )
    carry = (feats0, KeyframeState.initial(), jax.numpy.eye(4, dtype=jax.numpy.float32))

    # Warmup / compile on the first chunk.
    t0 = time.time()
    carry, res = step(carry[0], carry[1], carry[2], frames[1 : 1 + chunk], keys[:chunk], cam, config)
    jax.block_until_ready(res)
    log(f"compile+first chunk: {time.time() - t0:.1f}s")

    # Steady state over the remaining chunks.
    n_steady = (n_pairs - chunk) // chunk
    assert n_steady >= 2, "increase BENCH_FRAMES"
    t0 = time.time()
    done_frames = 0
    successes = 0
    for i in range(n_steady):
        start = chunk + i * chunk
        carry, res = step(
            carry[0], carry[1], carry[2],
            frames[1 + start : 1 + start + chunk],
            keys[start : start + chunk],
            cam,
            config,
        )
        done_frames += chunk
    jax.block_until_ready(res)
    elapsed = time.time() - t0
    successes = int(np.asarray(res.success).sum())

    fps = done_frames / elapsed
    log(
        f"steady-state: {done_frames} frames in {elapsed:.2f}s -> {fps:.1f} frames/s/chip "
        f"(last-chunk successes {successes}/{chunk})"
    )

    print(
        json.dumps(
            {
                "metric": "vo_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
