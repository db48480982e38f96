"""Per-op timing of the fused phase-2 keyframe step's constituents.

Times each map/keyframe op at bench shapes (capacity 16384, 500 features,
o_cap from config) as standalone jitted programs, plus one full fused
phase-2 chunk, to attribute the ms/keyframe cost measured by
tools/profile_flagship.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_phase2.py
"""

from __future__ import annotations

import time

import numpy as np


def _timeit(name, fn, variants, sync):
    out = fn(*variants[0])
    sync(out)
    t0 = time.time()
    outs = [fn(*v) for v in variants[1:]]
    for o in outs:
        sync(o)
    dt = (time.time() - t0) / (len(variants) - 1) * 1000
    print(f"{name:38s} {dt:8.2f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.feature.matcher import FeatureMatcher
    from slamtpu.mapping.map import MapState, map_find_matches, map_insert
    from slamtpu.mapping.triangulation import triangulate_points
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.pipeline.point_cloud import PointCloudConfig, _fused_carry_init, _fused_phase2_chunk
    from slamtpu.feature.detector import OrbConfig, detect_and_compute
    from slamtpu.io.synthetic import render_sequence
    from slamtpu.ops.ransac import RansacConfig
    from slamtpu.pipeline.vo import VoConfig
    from slamtpu.mapping.keyframe import KeyframeConfig

    print(f"devices: {jax.devices()}", flush=True)
    N = 4  # timed repeats (distinct inputs; the runtime memoizes)
    cap, k = 16384, 500
    cam = CameraIntrinsics.kitti()
    rng = np.random.default_rng(0)

    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.ravel()[:1])

    # Populated map state variants.
    def mk_state(seed):
        r = np.random.default_rng(seed)
        valid = np.zeros(cap, bool)
        valid[: cap // 2] = True
        return MapState(
            positions=jnp.asarray(r.uniform(-20, 60, (cap, 3)).astype(np.float32)),
            descriptors=jnp.asarray(r.integers(0, 256, (cap, 32), dtype=np.uint8)),
            observations=jnp.asarray(r.integers(1, 5, cap).astype(np.int32)),
            ids=jnp.asarray(np.arange(cap, dtype=np.int32)),
            valid=jnp.asarray(valid),
            next_id=jnp.int32(cap // 2),
        )

    states = [mk_state(i) for i in range(N + 1)]
    descs = [jnp.asarray(rng.integers(0, 256, (k, 32), dtype=np.uint8)) for _ in range(N + 1)]
    masks = jnp.ones((k,), bool)
    rots = [jnp.asarray(np.eye(3, dtype=np.float32) + 1e-4 * i) for i in range(N + 1)]
    trans = jnp.zeros((3,), jnp.float32)
    xyz = [jnp.asarray(rng.uniform(-20, 60, (k, 3)).astype(np.float32)) for _ in range(N + 1)]
    xy = [jnp.asarray(rng.uniform(0, 1000, (k, 2)).astype(np.float32)) for _ in range(N + 1)]

    ins = jax.jit(map_insert)
    _timeit("map_insert [16k cap, 500 rows]", ins,
            [(states[i], xyz[i], descs[i], masks) for i in range(N + 1)], sync)

    fm = jax.jit(lambda s, d, r: map_find_matches(s, cam, d, masks, r, trans))
    _timeit("map_find_matches [16k x 500]", fm,
            [(states[i], descs[i], rots[i]) for i in range(N + 1)], sync)

    matcher = FeatureMatcher()
    mt = jax.jit(lambda a, b: matcher.filter_good_matches(
        matcher.match_descriptors(a, b, query_mask=masks, train_mask=masks), 2.0))
    _timeit("kf match 500x500", mt, [(descs[i], descs[(i + 1) % (N + 1)]) for i in range(N + 1)], sync)

    tri = jax.jit(lambda r, p1, p2: triangulate_points(cam, (jnp.eye(3, dtype=jnp.float32), trans), (r, trans + 0.5), p1, p2))
    _timeit("triangulate 500", tri, [(rots[i], xy[i], xy[(i + 1) % (N + 1)]) for i in range(N + 1)], sync)

    # Full fused phase-2 chunk at bench shapes.
    chunk = 32
    scene = render_sequence(n_frames=chunk + 1, height=376, width=1241, n_points=4000,
                            step=0.8, intrinsics=cam, seed=0, noise=2.0)
    cfg = PointCloudConfig(
        vo=VoConfig(orb=OrbConfig(max_features=500), ransac=RansacConfig(iters=128),
                    keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3)),
        map_capacity=cap,
    )
    feats = detect_and_compute(jnp.asarray(scene.frames.astype(np.float32)), cfg.vo.orb)
    feats0 = jax.tree_util.tree_map(lambda x: x[0], feats)
    featsN = jax.tree_util.tree_map(lambda x: x[1:], feats)
    rel_rot = jnp.asarray(scene.rel_rotations.astype(np.float32))
    rel_trans = jnp.asarray(scene.rel_translations.astype(np.float32))
    is_kf = jnp.ones((chunk,), bool)

    carry0 = _fused_carry_init(cfg, feats0, jnp.float32)
    ph2 = lambda c, f, rr, rt: _fused_phase2_chunk(c, f, rr, rt, is_kf, cam, cfg)
    _timeit(f"fused phase2 chunk [{chunk} kf]", ph2,
            [(carry0, jax.tree_util.tree_map(lambda x: x ^ np.uint8(i) if x.dtype == jnp.uint8 else x, featsN),
              rel_rot + 1e-6 * i, rel_trans) for i in range(N + 1)], sync)


if __name__ == "__main__":
    main()
