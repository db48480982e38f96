"""Decompose the flagship fused pipeline's cost on the real chip.

Times three variants over the same synthetic clip:
  1. VO frontend only
  2. frontend + fused phase 2 with BA disabled (ba_interval=0)
  3. frontend + fused phase 2 with BA every 5 keyframes (bench config)

The deltas attribute steady-state cost to (frontend) vs (per-keyframe map
work: match/triangulate/insert/re-associate/top_k) vs (windowed BA solves).

Usage: python tools/profile_flagship.py [n_frames]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    t_total = int(sys.argv[1]) if len(sys.argv) > 1 else 257
    chunk = 32

    import jax

    from slamtpu.feature.detector import OrbConfig
    from slamtpu.io.synthetic import render_sequence
    from slamtpu.mapping.keyframe import KeyframeConfig
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.ops.ransac import RansacConfig
    from slamtpu.pipeline.point_cloud import PointCloudConfig, run_point_cloud_fused
    from slamtpu.pipeline.vo import VoConfig, run_vo

    print(f"devices: {jax.devices()}", flush=True)
    scene = render_sequence(
        n_frames=t_total, height=376, width=1241, n_points=4000, step=0.8,
        intrinsics=CameraIntrinsics.kitti(), seed=0, noise=2.0,
    )
    dev_frames = jax.device_put(scene.frames)
    np.asarray(dev_frames[0, 0])
    cam = scene.intrinsics

    vo = VoConfig(
        orb=OrbConfig(max_features=500),
        ransac=RansacConfig(iters=128),
        keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),
    )

    def timed(label, fn):
        fn(seed=1)  # compile + warm (distinct seed: runtime memoizes)
        t0 = time.time()
        out = fn(seed=0)
        dt = time.time() - t0
        print(f"{label}: {dt:.2f}s  ({(t_total - 1) / dt:.1f} frames/s)", flush=True)
        return out, dt

    _, t_front = timed(
        "frontend only        ",
        lambda seed: run_vo(dev_frames, cam, vo, chunk_size=chunk, seed=seed),
    )

    cfg_noba = PointCloudConfig(vo=vo, map_capacity=16384, ba_interval=0)
    _, t_noba = timed(
        "fused phase2, no BA  ",
        lambda seed: run_point_cloud_fused(dev_frames, cam, cfg_noba, chunk_size=chunk, seed=seed),
    )

    cfg_ba = PointCloudConfig(vo=vo, map_capacity=16384)
    res, t_ba = timed(
        "fused phase2, BA @5  ",
        lambda seed: run_point_cloud_fused(dev_frames, cam, cfg_ba, chunk_size=chunk, seed=seed),
    )

    n_kf = int(res.keyframe_frame_idx.shape[0])
    print(
        f"split: frontend {t_front:.2f}s | map work {t_noba - t_front:.2f}s "
        f"({(t_noba - t_front) / max(n_kf, 1) * 1000:.1f} ms/kf) | "
        f"BA {t_ba - t_noba:.2f}s ({res.ba_runs} runs -> "
        f"{(t_ba - t_noba) / max(res.ba_runs, 1) * 1000:.1f} ms/run)",
        flush=True,
    )


if __name__ == "__main__":
    main()
