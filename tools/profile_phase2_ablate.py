"""In-situ ablation of the fused phase-2 step (VERDICT r2 weakness 3).

The isolated micro-timings (profile_phase2_micro.py) sum to ~1.1 ms/step but
the fused step costs ~4.1 ms — this script localizes the difference by
monkeypatching individual pieces of the step to shape-correct no-ops and
re-timing the REAL run_point_cloud_fused at ba_interval=0 (BA priced
separately). kf_step resolves these names from module globals at trace time,
so patching the module is enough.

Usage: python tools/profile_phase2_ablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench

bench._enable_compile_cache(jax)

import slamtpu.pipeline.point_cloud as pc
from slamtpu.feature.detector import OrbConfig
from slamtpu.io.synthetic import render_sequence_cached
from slamtpu.mapping.keyframe import KeyframeConfig
from slamtpu.odometry.camera import CameraIntrinsics
from slamtpu.pipeline.point_cloud import PointCloudConfig
from slamtpu.pipeline.vo import VoConfig

T, CHUNK = 257, 32


def scene_frames():
    k = CameraIntrinsics.kitti()
    scene = render_sequence_cached(
        n_frames=T, height=376, width=1241, n_points=4000, step=0.8,
        yaw_rate=0.001, seed=5, noise=1.0, motion="forward", textured=True,
    )
    return scene.frames, k


ORIG = {
    "triangulate_points": pc.triangulate_points,
    "map_find_matches": pc.map_find_matches,
    "map_insert": pc.map_insert,
    "map_update_observations": pc.map_update_observations,
}


def stub_triangulate(intrinsics, pose1, pose2, p1, p2, **kw):
    n = p1.shape[0]
    return jnp.zeros((n, 3), jnp.float32) + 5.0, jnp.ones((n,), bool)


def stub_find_matches(state, intrinsics, desc, mask, rot, trans, ratio=2.0,
                      map_bits=None, map_pops=None, frame_xy=None):
    cap = state.capacity
    idx = jnp.zeros((cap,), jnp.int32)
    good = jnp.zeros((cap,), bool)
    if frame_xy is None:
        return idx, good
    return idx, good, jnp.zeros((cap,), jnp.float32)


def stub_insert(state, positions, descriptors, mask):
    return state


def stub_update_obs(state, matched):
    return state


def run_variant(name, frames, cam, patches):
    # CRITICAL: jax caches traced jaxprs keyed on the UNDERLYING function
    # object, so without clearing, every variant re-uses the first trace
    # and the monkeypatched stubs never enter the program — all the
    # round-3 ablation numbers measured the unpatched pipeline (pure
    # noise). Verified r4: stubbing changes the HLO only after a clear.
    jax.clear_caches()
    for k, v in ORIG.items():
        setattr(pc, k, v)
    for k, v in patches.items():
        setattr(pc, k, v)
    cfg = PointCloudConfig(
        vo=VoConfig(orb=OrbConfig(max_features=500), keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3)),
        map_capacity=16384,
        ba_interval=0,  # BA priced separately; isolate the base step
        prune_interval=0,
    )
    dev = jax.device_put(frames)
    np.asarray(dev[0, 0])
    pc.run_point_cloud_fused(dev, cam, cfg, chunk_size=CHUNK, seed=1)
    t0 = time.time()
    res = pc.run_point_cloud_fused(dev, cam, cfg, chunk_size=CHUNK, seed=0)
    dt = time.time() - t0
    print(f"{name:28s} {dt:6.2f}s  {(T - 1) / dt:7.1f} frames/s", flush=True)
    for k, v in ORIG.items():
        setattr(pc, k, v)
    return dt


ALL_STUBS = {
    "triangulate_points": stub_triangulate,
    "map_find_matches": stub_find_matches,
    "map_insert": stub_insert,
    "map_update_observations": stub_update_obs,
}


def run_skeleton(name, frames, cam, no_keyframes=False, chunk=CHUNK):
    """Floor variants: frontend + scan machinery with phase-2 work removed."""
    from slamtpu.mapping.keyframe import KeyframeConfig as KC

    kf = KC(1e18, 1e18, 0.0, 10**9) if no_keyframes else KC(0.03, 0.03, 0.7, 3)
    cfg = PointCloudConfig(
        vo=VoConfig(orb=OrbConfig(max_features=500), keyframe=kf),
        map_capacity=16384, ba_interval=0, prune_interval=0,
    )
    dev = jax.device_put(frames)
    np.asarray(dev[0, 0])
    pc.run_point_cloud_fused(dev, cam, cfg, chunk_size=chunk, seed=1)
    t0 = time.time()
    pc.run_point_cloud_fused(dev, cam, cfg, chunk_size=chunk, seed=0)
    dt = time.time() - t0
    print(f"{name:28s} {dt:6.2f}s  {(T - 1) / dt:7.1f} frames/s", flush=True)


def main():
    frames, cam = scene_frames()
    which = set(sys.argv[1:]) or {"pieces", "skeleton"}
    if "pieces" in which:
        run_variant("base (no ba/prune)", frames, cam, {})
        run_variant("- triangulation", frames, cam, {"triangulate_points": stub_triangulate})
        run_variant("- find_matches", frames, cam, {"map_find_matches": stub_find_matches})
        run_variant("- insert", frames, cam, {"map_insert": stub_insert})
        run_variant("- all map ops", frames, cam, ALL_STUBS)
    if "skeleton" in which:
        # (A "1 chunk vs 8" dispatch-cost variant used chunk=256 here; the
        # detector batch guard now rejects it — batch >= 33 hard-crashes the
        # v5e worker, detector.py module note.)
        # Scan+cond floor: every step takes the `skipped` branch.
        run_skeleton("no keyframes (skip branch)", frames, cam, no_keyframes=True)
        # Frontend-only floor: phase-2 chunk bypassed entirely.
        orig_chunk = pc._fused_phase2_chunk

        def passthrough(carry, feats, rel_rot, rel_trans, is_kf, intrinsics, config):
            c = feats.xy.shape[0]
            w, o_cap = config.ba_window, config.max_obs_per_kf
            outs = pc._FusedStepOut(
                kf_idx=jnp.full((c,), -1, jnp.int32),
                new_rot=jnp.broadcast_to(carry.prev_rot, (c, 3, 3)),
                new_trans=jnp.broadcast_to(carry.prev_trans, (c, 3)),
                ba_flag=jnp.zeros((c,), bool),
                ring_rot=jnp.broadcast_to(carry.ring_rot, (c, w, 3, 3)),
                ring_trans=jnp.broadcast_to(carry.ring_trans, (c, w, 3)),
                ring_kf=jnp.broadcast_to(carry.ring_kf, (c, w)),
                obs_slots=jnp.zeros((c, o_cap), jnp.int32),
                obs_ids=jnp.full((c, o_cap), -1, jnp.int32),
                obs_px=jnp.zeros((c, o_cap, 2), jnp.float32),
                obs_mask=jnp.zeros((c, o_cap), bool),
            )
            return carry, outs

        pc._fused_phase2_chunk = passthrough
        try:
            run_skeleton("frontend only (no phase 2)", frames, cam)
        finally:
            pc._fused_phase2_chunk = orig_chunk


if __name__ == "__main__":
    main()
