"""Isolate run_vo's overhead vs a bench-style raw chunk loop.

Both process the same 256 KITTI-sized frames, chunk 32, identical config.
  (a) raw loop: preplaced per-chunk blocks, vo_chunk jit, one final fetch
  (b) raw loop, blocks sliced from one device array (run_vo's access pattern)
  (c) run_vo(device_frames)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_runvo.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.feature.detector import OrbConfig, detect_and_compute
    from slamtpu.io.synthetic import render_sequence
    from slamtpu.mapping.keyframe import KeyframeConfig, KeyframeState
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.ops.ransac import RansacConfig
    from slamtpu.pipeline.vo import VoConfig, run_vo, _vo_chunk_jit

    print(f"devices: {jax.devices()}", flush=True)
    t_total, chunk = 257, 32
    scene = render_sequence(
        n_frames=t_total, height=376, width=1241, n_points=4000, step=0.8,
        intrinsics=CameraIntrinsics.kitti(), seed=0, noise=2.0,
    )
    dev_frames = jax.device_put(scene.frames)
    np.asarray(dev_frames[0, 0])
    cam = scene.intrinsics
    config = VoConfig(
        orb=OrbConfig(max_features=500),
        ransac=RansacConfig(iters=128),
        keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),
    )
    n_pairs = t_total - 1

    def raw_loop(frames_src, preplaced: bool, seed: int):
        keys = jax.random.split(jax.random.PRNGKey(seed), n_pairs)
        feats0 = jax.tree_util.tree_map(
            lambda x: x[0], detect_and_compute(frames_src[:1], config.orb)
        )
        carry = (feats0, KeyframeState.initial(), jnp.eye(4, dtype=jnp.float32))
        if preplaced:
            blocks = [
                jax.device_put(jnp.asarray(frames_src[s + 1 : s + 1 + chunk]))
                for s in range(0, n_pairs, chunk)
            ]
            np.asarray(blocks[-1][0, 0])
        results = []
        for i, start in enumerate(range(0, n_pairs, chunk)):
            block = blocks[i] if preplaced else frames_src[start + 1 : start + 1 + chunk]
            carry, res = _vo_chunk_jit(
                carry[0], carry[1], carry[2], block, keys[start : start + chunk],
                cam, config, None, None,
            )
            results.append(res)
        out = [jax.tree_util.tree_map(np.asarray, r) for r in results]
        return out

    def timed(label, fn):
        fn(seed=1)
        t0 = time.time()
        fn(seed=0)
        dt = time.time() - t0
        print(f"{label}: {dt:.2f}s ({n_pairs / dt:.1f} frames/s)", flush=True)

    timed("raw loop, preplaced blocks ", lambda seed: raw_loop(dev_frames, True, seed))
    timed("raw loop, sliced blocks    ", lambda seed: raw_loop(dev_frames, False, seed))
    timed("run_vo, device frames      ", lambda seed: run_vo(dev_frames, cam, config, chunk_size=chunk, seed=seed))


if __name__ == "__main__":
    main()
