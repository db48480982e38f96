"""Ablation timing of the fused point-cloud pipeline on TPU.

Times run_point_cloud_fused end-to-end under config ablations to localize
the phase-2 cost (VERDICT r2 weakness 3: flagship 105 fps vs frontend 645).
Each variant: one warmup run (compile; distinct seed) + one timed run.

Usage: python tools/profile_flagship.py [variant ...]
Variants: full, no_ba, no_prune, no_ba_no_prune, cap4096, obs256, frontend
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

# Reuse the bench's persistent XLA compile cache: each ablation variant is a
# distinct config of the (large) fused phase-2 program, and cold TPU compiles
# for all variants cost more than the measurements themselves.
import bench

bench._enable_compile_cache(jax)

from slamtpu.feature.detector import OrbConfig
from slamtpu.io.synthetic import render_sequence_cached
from slamtpu.mapping.keyframe import KeyframeConfig
from slamtpu.odometry.camera import CameraIntrinsics
from slamtpu.pipeline.point_cloud import PointCloudConfig, run_point_cloud_fused
from slamtpu.pipeline.vo import VoConfig

T, CHUNK = 257, 32


def scene_frames():
    k = CameraIntrinsics.kitti()
    scene = render_sequence_cached(
        n_frames=T, height=376, width=1241, n_points=4000, step=0.8,
        intrinsics=k, seed=0, noise=2.0,
    )
    dev = jax.device_put(scene.frames)
    np.asarray(dev[0, 0])
    return dev, scene.intrinsics


def cfg_variant(name):
    kw = {}
    if name in ("no_ba", "no_ba_no_prune"):
        kw["ba_interval"] = 0
    if name in ("no_prune", "no_ba_no_prune"):
        kw["prune_interval"] = 0
    if name == "cap4096":
        kw["map_capacity"] = 4096
    if name == "obs256":
        kw["max_obs_per_kf"] = 256
        kw["max_ba_observations"] = 1024
    vo_kw = {}
    if name == "solver8pt":
        from slamtpu.ops.ransac import RansacConfig

        vo_kw["ransac"] = RansacConfig(iters=128)
    return PointCloudConfig(
        vo=VoConfig(
            orb=OrbConfig(max_features=500),
            keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),
            **vo_kw,
        ),
        map_capacity=kw.pop("map_capacity", 16384),
        **kw,
    )


def main():
    variants = sys.argv[1:] or ["full", "no_ba", "no_ba_no_prune", "cap4096", "obs256"]
    frames, cam = scene_frames()
    for name in variants:
        cfg = cfg_variant(name)
        t0 = time.time()
        run_point_cloud_fused(frames, cam, cfg, chunk_size=CHUNK, seed=1)
        compile_s = time.time() - t0
        t0 = time.time()
        res = run_point_cloud_fused(frames, cam, cfg, chunk_size=CHUNK, seed=0)
        dt = time.time() - t0
        print(
            f"{name:16s}: {((T - 1) / dt):7.1f} frames/s  ({dt:.2f}s, "
            f"{res.keyframe_rotations.shape[0]} kf, {res.ba_runs} ba, "
            f"compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
