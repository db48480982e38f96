"""Map vs reference unit tests (map.rs:179-239) + fixed-capacity semantics."""

import jax.numpy as jnp
import numpy as np

from slamtpu import CameraIntrinsics, Map
from slamtpu.mapping.map import MapState, map_find_matches, map_insert, map_prune
from slamtpu.mapping.triangulation import MapPoint


def make_map(capacity=64):
    return Map(CameraIntrinsics.webcam_vga(), capacity=capacity)


def test_add_and_size(rng):
    m = make_map()
    pts = [MapPoint(position=rng.normal(size=3) + [0, 0, 10]) for _ in range(5)]
    m.add_points(pts)
    assert m.size() == 5
    ids = sorted(p.id for p in m.points())
    assert ids == [0, 1, 2, 3, 4]  # sequential ids (map.rs:31-37)
    m.add_points([MapPoint(position=np.array([0.0, 0.0, 5.0]))])
    assert sorted(p.id for p in m.points())[-1] == 5


def test_central_projection_match(rng):
    # map.rs test: a point on the optical axis projects to (cx, cy) and
    # matches a frame feature with the same descriptor.
    m = make_map()
    desc = rng.integers(0, 256, size=(1, 32), dtype=np.uint8)
    mp = MapPoint(position=np.array([0.0, 0.0, 10.0]), descriptor=desc[0])
    m.add_points([mp])

    frame_desc = np.vstack([rng.integers(0, 256, size=(3, 32), dtype=np.uint8), desc])
    matches = m.find_matches(frame_desc, (np.eye(3), np.zeros(3)))
    assert matches == [(0, 3)]


def test_behind_camera_not_matched(rng):
    m = make_map()
    desc = rng.integers(0, 256, size=(1, 32), dtype=np.uint8)
    m.add_points([MapPoint(position=np.array([0.0, 0.0, -10.0]), descriptor=desc[0])])
    matches = m.find_matches(desc, (np.eye(3), np.zeros(3)))
    assert matches == []


def test_update_observations_and_prune(rng):
    m = make_map()
    descs = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
    m.add_points([MapPoint(position=np.array([i - 1.0, 0.0, 10.0]), descriptor=descs[i]) for i in range(3)])
    # Observe point 1 once more.
    m.update_observations([(1, 0)])
    assert m.prune_outliers() == 2  # points 0 and 2 dropped (obs 1 < 2)
    assert m.size() == 1
    assert m.points()[0].id == 1
    assert len(m.stable_points()) == 1


def test_capacity_overflow_drops(rng):
    m = make_map(capacity=4)
    pts = [MapPoint(position=rng.normal(size=3) + [0, 0, 10]) for _ in range(6)]
    m.add_points(pts)
    assert m.size() == 4


def test_freed_slots_are_reused(rng):
    m = make_map(capacity=4)
    descs = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)
    m.add_points([MapPoint(position=np.array([0.0, 0.0, 10.0]), descriptor=descs[i]) for i in range(4)])
    m.prune_outliers()  # everything has obs=1 -> all dropped
    assert m.size() == 0
    m.add_points([MapPoint(position=np.array([0.0, 0.0, 5.0]), descriptor=descs[4])])
    assert m.size() == 1
    # ids keep incrementing even after pruning.
    assert m.points()[0].id == 4


def test_jit_side_state_roundtrip(rng):
    """map_insert/find/prune compose under jit with static shapes."""
    import jax

    cam = CameraIntrinsics.webcam_vga()

    @jax.jit
    def step(state, positions, descs, mask, frame_desc):
        state = map_insert(state, positions, descs, mask)
        idx, good = map_find_matches(
            state, cam, frame_desc, jnp.ones((frame_desc.shape[0],), bool), jnp.eye(3), jnp.zeros(3)
        )
        from slamtpu.mapping.map import map_update_observations

        state = map_update_observations(state, good)
        return map_prune(state, 2), good

    state = MapState.empty(16)
    desc = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    positions = np.tile([[0.0, 0.0, 10.0]], (4, 1)) + rng.normal(scale=0.1, size=(4, 3))
    new_state, good = step(state, jnp.asarray(positions), jnp.asarray(desc), jnp.ones(4, bool), jnp.asarray(desc))
    # All four insert, all four rematch (identical descriptors), obs=2 -> all survive prune.
    assert int(new_state.size()) == 4
    assert int(jnp.sum(good.astype(jnp.int32))) == 4
