"""Micro-timing of the fused phase-2 pieces on TPU (VERDICT r2 weakness 3).

Per-call dispatch through the axon tunnel costs ~35 ms, so isolated jit
calls cannot resolve sub-millisecond per-step costs. Instead each component
is timed as a 256-iteration `lax.scan` inside ONE program (the same posture
it runs in inside the fused phase-2 chunk): dispatch once, divide by 256.

Includes prototype replacements timed side by side:
  - free-slot / observation-rank tables via searchsorted instead of
    capacity-sized scatters;
  - the BA window solve (current) to price the per-solve cost.

axon gotchas honored: inputs perturbed per timed call (the runtime memoizes
identical executions), sync via a single-leaf fetch.
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

from slamtpu.feature.matcher import FeatureMatcher
from slamtpu.mapping.map import MapState, map_find_matches, map_insert
from slamtpu.mapping.triangulation import triangulate_points
from slamtpu.odometry.camera import CameraIntrinsics

CAP, K, O_CAP, W, L_MAX = 16384, 500, 1024, 5, 2048
STEPS = 256


def time_scan(name, step_fn, carry0, n=STEPS, reps=3):
    """step_fn(carry, i) -> (carry, None); timed as one scan program."""

    @jax.jit
    def run(c0, offset):
        c, _ = jax.lax.scan(
            lambda c, i: step_fn(c, i + offset), c0, jnp.arange(n, dtype=jnp.int32)
        )
        return c

    out = run(carry0, jnp.int32(0))
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = []
    for r in range(1, reps + 1):
        t0 = time.time()
        out = run(carry0, jnp.int32(r))
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best.append(time.time() - t0)
    ms = min(best) / n * 1e3
    print(f"{name:36s} {ms:8.4f} ms/step  (total {min(best):.2f}s)", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    cam = CameraIntrinsics.kitti()

    state = MapState.empty(CAP)
    n_live = CAP // 2
    state = state._replace(
        positions=jnp.asarray(
            rng.normal(0, 20, (CAP, 3)).astype(np.float32) + np.array([0, 0, 30], np.float32)
        ),
        descriptors=jnp.asarray(rng.integers(0, 256, (CAP, 32), dtype=np.uint8)),
        observations=jnp.asarray((rng.random(CAP) < 0.5).astype(np.int32) + 1),
        ids=jnp.asarray(np.arange(CAP, dtype=np.int32)),
        valid=jnp.asarray(np.arange(CAP) < n_live),
        next_id=jnp.asarray(n_live, jnp.int32),
    )
    new_pos = jnp.asarray(rng.normal(0, 20, (K, 3)).astype(np.float32))
    new_desc = jnp.asarray(rng.integers(0, 256, (K, 32), dtype=np.uint8))
    ins_mask = jnp.asarray(rng.random(K) < 0.4)
    frame_desc = jnp.asarray(rng.integers(0, 256, (K, 32), dtype=np.uint8))
    frame_mask = jnp.ones((K,), bool)
    xy = jnp.asarray(rng.uniform(0, 600, (K, 2)).astype(np.float32))

    # 1. map_insert as-is (steady-state: insert then un-insert by restoring
    # validity, so the map does not fill up across 256 steps).
    def ins_step(c, i):
        s = map_insert(state._replace(next_id=c), new_pos, new_desc, ins_mask)
        return s.next_id, None

    time_scan("map_insert (scatter table)", ins_step, jnp.int32(0))

    def insert_ss(s, positions, descriptors, mask):
        cap = s.capacity
        free = ~s.valid
        cfree = jnp.cumsum(free.astype(jnp.int32))
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        n_free = cfree[-1]
        insert_ok = mask & (rank < n_free)
        slot = jnp.searchsorted(cfree, rank + 1, side="left").astype(jnp.int32)
        slot = jnp.where(insert_ok, slot, cap)
        ids = s.next_id + rank.astype(jnp.int32)
        return MapState(
            positions=s.positions.at[slot].set(positions, mode="drop"),
            descriptors=s.descriptors.at[slot].set(descriptors, mode="drop"),
            observations=s.observations.at[slot].set(jnp.int32(1), mode="drop"),
            ids=s.ids.at[slot].set(ids, mode="drop"),
            valid=s.valid.at[slot].set(True, mode="drop"),
            next_id=s.next_id + jnp.sum(mask, dtype=jnp.int32),
        )

    def ins_ss_step(c, i):
        s = insert_ss(state._replace(next_id=c), new_pos, new_desc, ins_mask)
        return s.next_id, None

    time_scan("map_insert (searchsorted)", ins_ss_step, jnp.int32(0))

    # 2. map_find_matches.
    def fm_step(c, i):
        d = frame_desc.at[0, 0].set((i % 256).astype(jnp.uint8))
        idx, good = map_find_matches(state, cam, d, frame_mask, jnp.eye(3), c)
        return c + 0.001 * good[0], None

    time_scan("map_find_matches cap=16k", fm_step, jnp.zeros(3))

    # 3. observation compaction: scatter vs searchsorted.
    mgood = jnp.asarray(rng.random(CAP) < 0.05)

    def compact_scatter(mg):
        obs_rank = jnp.cumsum(mg.astype(jnp.int32)) - 1
        slots = (
            jnp.zeros((O_CAP,), jnp.int32)
            .at[jnp.where(mg & (obs_rank < O_CAP), obs_rank, O_CAP)]
            .set(jnp.arange(CAP, dtype=jnp.int32), mode="drop")
        )
        omask = mg[slots] & (jnp.arange(O_CAP) <= obs_rank[-1])
        return slots, omask

    def compact_ss(mg):
        cg = jnp.cumsum(mg.astype(jnp.int32))
        slots = jnp.minimum(
            jnp.searchsorted(cg, jnp.arange(1, O_CAP + 1)).astype(jnp.int32), CAP - 1
        )
        omask = mg[slots] & (jnp.arange(O_CAP) < cg[-1])
        return slots, omask

    def cs_step(c, i):
        mg = mgood.at[i % CAP].set(True)
        s, m = compact_scatter(mg)
        return c + s[0] + m[0], None

    def css_step(c, i):
        mg = mgood.at[i % CAP].set(True)
        s, m = compact_ss(mg)
        return c + s[0] + m[0], None

    time_scan("obs compaction (scatter)", cs_step, jnp.int32(0))
    time_scan("obs compaction (searchsorted)", css_step, jnp.int32(0))
    s1, m1 = jax.jit(compact_scatter)(mgood)
    s2, m2 = jax.jit(compact_ss)(mgood)
    eq = bool(jnp.all(jnp.where(m1, s1, -1) == jnp.where(m2, s2, -1)) & jnp.all(m1 == m2))
    print(f"   compaction equal: {eq}", flush=True)

    # 4. triangulation at K.
    def tri_step(c, i):
        p1 = xy + c
        xyz, valid = triangulate_points(
            cam, (jnp.eye(3), jnp.zeros(3)), (jnp.eye(3), jnp.ones(3) * 0.1), p1, xy
        )
        return c + 1e-6 * xyz[0, 0], None

    time_scan("triangulate K=500", tri_step, jnp.zeros(()))

    # 5. keyframe match K x K.
    matcher = FeatureMatcher()

    def km_step(c, i):
        d = frame_desc.at[0, 0].set((i % 256).astype(jnp.uint8))
        m = matcher.match_descriptors(d, new_desc, query_mask=frame_mask, train_mask=frame_mask)
        g = matcher.filter_good_matches(m, 2.0)
        return c + g.train_idx[0], None

    time_scan("keyframe match KxK", km_step, jnp.int32(0))

    # 6. BA window solve at bench shapes (scan of 32 solves).
    from slamtpu.mapping.bundle_adjustment import BaConfig
    from slamtpu.pipeline.point_cloud import _ba_window_solve

    slots = jnp.asarray(rng.integers(0, n_live, L_MAX, dtype=np.int32))
    l_mask = jnp.ones((L_MAX,), bool)
    m_obs = W * O_CAP
    kf_idx = jnp.asarray(np.repeat(np.arange(W, dtype=np.int32), O_CAP))
    pt_idx = jnp.asarray(rng.integers(0, L_MAX, m_obs, dtype=np.int32))
    pixels = jnp.asarray(rng.uniform(0, 600, (m_obs, 2)).astype(np.float32))
    obs_mask = jnp.asarray(rng.random(m_obs) < 0.5)
    rot_w = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (W, 3, 3))
    trans_w = jnp.asarray(rng.normal(0, 0.1, (W, 3)).astype(np.float32))
    pose_free = jnp.asarray(np.array([False, False, True, True, True]))

    def ba_step(c, i):
        px = pixels + 0.001 * c
        _, new_trans, new_pos, err = _ba_window_solve(
            state.positions, rot_w, trans_w, pose_free, slots, l_mask,
            kf_idx, pt_idx, px, obs_mask, cam, BaConfig(), False,
        )
        return c + 1e-6 * err, None

    time_scan("ba_window_solve (w=5,L=2048)", ba_step, jnp.zeros(()), n=32)


if __name__ == "__main__":
    main()
